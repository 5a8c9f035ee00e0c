"""Exact-decimal aggregation helpers for oracle parity.

Summing IEEE doubles is order-dependent, and Spark's partial/final
aggregation order differs from DuckDB's — so a raw ``SUM(double)``
hash-mismatches the oracle in the low bits.  Both engines, however,
round an *identical* per-row double to decimal identically, and decimal
summation is exact and order-independent.  So every double aggregate in
the registry follows the pattern::

    Spark :  sum(cast(expr as decimal(25,S))) :: double
    DuckDB:  CAST(SUM(CAST(expr AS DECIMAL(25,S))) AS DOUBLE)

The per-row ``expr`` must be written with the same operation tree in
both engines (IEEE double ops are deterministic given the same order),
then the decimal round-trip makes the aggregate bit-stable.

Scale S=4 keeps four fractional digits — enough for money ×(1±disc)
products; precision 25 leaves 21 integer digits of headroom, far beyond
any 100 TB sum of <1e6-magnitude values (1e6 rows/TB × 1e2 TB × 1e6 ≈
1e14 « 1e21).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,8)"
SQL_DEC = "DECIMAL(30,8)"


def dsum(expr: Column | str, alias: str) -> Column:
    """Order-independent double sum (decimal accumulation)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(expr: Column | str, alias: str) -> Column:
    """Order-independent double average: exact decimal sum / count."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dec_to_double(dec_expr: str) -> str:
    """DuckDB decimal→double via a VARCHAR detour.

    DuckDB's direct ``CAST(DECIMAL AS DOUBLE)`` divides the int128
    mantissa by 10^scale in floating point, which can land 1 ulp off the
    correctly-rounded double for sums ≥ ~1e10 (observed: sf0.1 orders
    revenue 11927346018.29 → …18.289999).  Java's BigDecimal→double
    (what Spark's decimal cast uses) is correctly rounded, as is
    strtod — so forcing DuckDB through decimal→VARCHAR→DOUBLE makes
    both engines produce the identical bit pattern at any magnitude.
    ORACLE_PARITY.md rule 15.
    """
    return f"CAST(CAST({dec_expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    return f"{sql_dec_to_double(f'SUM(CAST({expr} AS {SQL_DEC}))')} AS {alias}"


# ---------------------------------------------------------------------------
# Decimal-native money arithmetic
# ---------------------------------------------------------------------------
# Casting a *computed* double (e.g. price × (1-disc) × (1+tax)) to decimal
# is NOT engine-stable: the product carries a few ulp of float noise, and
# when its shortest repr lands on a '5' at the rounding digit Spark
# (HALF_UP on BigDecimal.valueOf's shortest repr) and DuckDB (rounding the
# exact binary expansion) can disagree — observed at sf0.1 in sum_charge.
# Casting the *inputs* is safe (2-decimal money doubles sit half-an-ulp
# from their decimal value, 3 orders below the rounding grain), and
# decimal × decimal is exact in both engines.  So money expressions are
# built decimal-native: cast inputs, multiply in decimal, sum exactly.

D_PRICE = "decimal(18,2)"
D_RATE = "decimal(4,2)"


def price_dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(D_PRICE)


def rate_dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(D_RATE)


def dsum_exact(dec_expr: Column, alias: str) -> Column:
    """Exact decimal sum of an (already decimal) expression → double."""
    return F.sum(dec_expr).cast("double").alias(alias)


def sql_price(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_rate(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(4,2))"


def sql_dsum_exact(dec_expr: str, alias: str) -> str:
    return f"{sql_dec_to_double(f'SUM({dec_expr})')} AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"{sql_dec_to_double(f'SUM(CAST({expr} AS {SQL_DEC}))')} / COUNT({expr}) AS {alias}"
