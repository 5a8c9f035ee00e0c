"""Round-14 plan evidence for the ITERATIVE graph ops (VERDICT r13 #9).

The CC/HITS loops localCheckpoint every round, which truncates lineage:
the committed *_after.txt dumps show only the final post-checkpoint job,
so the claimed per-round BroadcastHashJoin was not plan-verifiable from
the r13 dumps. This script dumps ONE round's plan PRE-checkpoint:

  * cc_round — literally `_cc_round(edges2, labels)`, the exact helper
    all three CC loops execute each round (operators/analytics.py).
  * hits_round — one hub-update round, the same expression graph_hits
    builds (edges ⋈ _bcast_nodes(a) → groupBy(cust).sum).

Run twice: default env (broadcast hint on) and SOLARFLARE_GRAPH_BCAST=0
(shuffle fallback), writing plans/r14/cc_round_{bcast_on,bcast_off}.txt
and hits_round_{bcast_on,bcast_off}.txt.

Measurement-only tooling; not part of the driver contract or the bench.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.operators.analytics import (
    _bcast_nodes,
    _cc_round,
    copurchase_edges,
)
from solarflare_etl_pipeline_spark.session import get_spark


def _dump(df, name: str, suffix: str) -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out = os.path.join(here, "plans", "r14", f"{name}_{suffix}.txt")
    with open(out, "w") as fh:
        fh.write(buf.getvalue())
    print(f"[plan] wrote {out} ({len(buf.getvalue())} chars)")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = (
        "bcast_on"
        if os.environ.get("SOLARFLARE_GRAPH_BCAST", "1") != "0"
        else "bcast_off"
    )
    spark = get_spark("r14-round-capture")

    # --- CC: one _cc_round over the op's own edges2/labels build ------
    li = table(spark, sf_dir, "lineitem")
    edges = copurchase_edges(li)
    edges2 = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges2.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint()
    )
    _dump(_cc_round(edges2, labels), "cc_round", suffix)

    # --- HITS: one hub-update round (graph_hits' loop body) -----------
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    hedges = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
        .localCheckpoint()
    )
    a = hedges.groupBy("part").agg(
        (F.count("*").cast("long") * 1_000_000).alias("a")
    ).localCheckpoint()
    hub = (
        hedges.join(_bcast_nodes(a), "part")
        .groupBy("cust")
        .agg(F.sum("a").cast("long").alias("h"))
    )
    _dump(hub, "hits_round", suffix)


if __name__ == "__main__":
    main()
