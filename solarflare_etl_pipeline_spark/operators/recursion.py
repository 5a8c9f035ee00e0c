"""Recursive-query operators: hierarchy flattening via ``WITH RECURSIVE``.

Spark 4 ships native recursive CTEs (SPARK-24497), which close the one
relational gap the rest of the registry works around with driver-side
fixed-point loops (``llm_dedup_cluster``, ``graph_pagerank``): a
hierarchy walk of UNKNOWN depth expressed declaratively, with Catalyst
owning the iteration. The reference's pipeline has no recursion, but
any consumer modeling org charts / BOM explosions / referral chains on
top of its loaded tables hits this immediately.

Scale notes (100 TB): a recursive CTE executes as repeated equi-joins
of the frontier (the previous iteration's output) against the child
table — iterations are bounded by the DEPTH of the hierarchy
(O(log N) for balanced trees like this fixture's binary forest, NOT
O(rows)); each iteration is one hash join that AQE sizes from runtime
frontier statistics. State carried between iterations is the frontier
only. The same walk done driver-side would serialize N/depth rounds of
``collect()``; here everything stays on executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from solarflare_etl_pipeline_spark.catalog import register_views
from solarflare_etl_pipeline_spark.registry import register

#: Keys below this bound are forest roots; every key k >= ROOTS has
#: parent k DIV 2, giving a deterministic binary forest over the dense
#: customer keyspace (no extra edge table needed — the parent function
#: is computable, which also means the 100 TB variant needs no edge
#: shuffle at all, just the recursive join on the derived key).
ROOTS = 4


@register(
    "hierarchy_flatten",
    oracle=f"""
        WITH RECURSIVE anc AS (
            SELECT c_custkey, c_custkey AS root_key,
                   CAST(0 AS BIGINT) AS depth
            FROM customer WHERE c_custkey < {ROOTS}
            UNION ALL
            SELECT c.c_custkey, a.root_key, a.depth + CAST(1 AS BIGINT)
            FROM customer c JOIN anc a ON c.c_custkey // 2 = a.c_custkey
            WHERE c.c_custkey >= {ROOTS}
        )
        SELECT c_custkey, root_key, depth FROM anc
    """,
    doc="Hierarchy flattening with a NATIVE recursive CTE (Spark 4, "
    "SPARK-24497): every customer resolved to its forest root and depth "
    "by walking parent(k) = k DIV 2 up from the binary-forest roots "
    "(keys < 4). The anchor selects roots at depth 0; each recursive "
    "step equi-joins the remaining nodes onto the previous frontier — "
    "iterations = tree depth (log2 of the keyspace: ~11 at sf0.01, ~24 "
    "at 100 TB), each a plain hash join Catalyst plans like any other. "
    "The declarative form replaces the driver-side loop pattern "
    "(llm_dedup_cluster) wherever semantics are plain ancestor closure. "
    "All-BIGINT output → hash-exact; DuckDB runs the same recursion "
    "with // for DIV. Depth distribution and the depth == "
    "floor(log2(k / root)) identity are pinned in tests/"
    "test_semantics.py.",
)
def hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH RECURSIVE anc AS (
            SELECT c_custkey, c_custkey AS root_key,
                   CAST(0 AS BIGINT) AS depth
            FROM customer WHERE c_custkey < {ROOTS}
            UNION ALL
            SELECT c.c_custkey, a.root_key, a.depth + CAST(1 AS BIGINT)
            FROM customer c JOIN anc a ON c.c_custkey DIV 2 = a.c_custkey
            WHERE c.c_custkey >= {ROOTS}
        )
        SELECT c_custkey, root_key, depth FROM anc
        """
    )


@register(
    "hierarchy_rollup",
    oracle=f"""
        WITH RECURSIVE anc AS (
            SELECT c_custkey, c_custkey AS root_key
            FROM customer WHERE c_custkey < {ROOTS}
            UNION ALL
            SELECT c.c_custkey, a.root_key
            FROM customer c JOIN anc a ON c.c_custkey // 2 = a.c_custkey
            WHERE c.c_custkey >= {ROOTS}
        )
        SELECT a.root_key,
               COUNT(*) AS n_members,
               CAST(COALESCE(SUM(f.n_orders), 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(f.cents), 0) AS BIGINT) AS subtree_cents
        FROM anc a LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ) f ON f.o_custkey = a.c_custkey
        GROUP BY a.root_key
    """,
    doc="Subtree aggregation over the recursive closure: order volume "
    "rolled up to each hierarchy root (the 'territory total' every org-"
    "chart report needs). The fact table is PRE-AGGREGATED to one row "
    "per customer BEFORE touching the closure — the recursion-side "
    "join then carries |customers| rows instead of |orders|, members "
    "are counted with a plain COUNT(*) (the closure is already "
    "distinct per node — no COUNT(DISTINCT) expand), and the final "
    "rollup merges pre-summed partials. Fact-side cost is one "
    "partial+final hash agg regardless of hierarchy shape; recursion "
    "cost stays dimension-sided. Integer-cents → hash-exact.",
)
def hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH RECURSIVE anc AS (
            SELECT c_custkey, c_custkey AS root_key
            FROM customer WHERE c_custkey < {ROOTS}
            UNION ALL
            SELECT c.c_custkey, a.root_key
            FROM customer c JOIN anc a ON c.c_custkey DIV 2 = a.c_custkey
            WHERE c.c_custkey >= {ROOTS}
        )
        SELECT a.root_key,
               COUNT(*) AS n_members,
               CAST(COALESCE(SUM(f.n_orders), 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(f.cents), 0) AS BIGINT) AS subtree_cents
        FROM anc a LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ) f ON f.o_custkey = a.c_custkey
        GROUP BY a.root_key
        """
    )
