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


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT({expr}) AS {alias}"
