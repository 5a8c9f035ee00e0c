"""Parquet-footer proof that z-order clustering enables two-dimensional
data skipping.

Writes the same lineitem projection twice — once range-partitioned and
sorted by the Morton zkey, once by a plain single-column sort — then
reads ONLY the parquet footers (pyarrow row-group statistics, the exact
metadata a scan planner prunes with) and checks:

* the single-column sort gives near-perfect l_partkey spans per file
  but near-full-domain l_suppkey spans (no pruning on the second dim);
* the z-ordered layout shrinks the AVERAGE per-file span in BOTH
  dimensions to well under half the domain, so min/max pruning works
  for predicates on either column.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.sinks import _morton_spread

N_FILES = 8


def _per_file_spans(path: str, col: str) -> list[int]:
    spans = []
    for f in os.listdir(path):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        assert los, f"no footer stats for {col} in {f}"
        spans.append(max(his) - min(los))
    assert len(spans) == N_FILES
    return spans


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ext = l.agg(
        F.min("l_partkey").alias("lo_pk"),
        F.max("l_partkey").alias("hi_pk"),
        F.min("l_suppkey").alias("lo_sk"),
        F.max("l_suppkey").alias("hi_sk"),
    ).withColumn("one", F.lit(1))
    b_pk = "((l_partkey - lo_pk) * 65535 DIV GREATEST(hi_pk - lo_pk, 1))"
    b_sk = "((l_suppkey - lo_sk) * 65535 DIV GREATEST(hi_sk - lo_sk, 1))"
    zkey = f"({_morton_spread(b_pk)} | ({_morton_spread(b_sk)} << 1))"
    keyed = (
        l.withColumn("one", F.lit(1))
        .join(F.broadcast(ext), "one")
        .select("l_partkey", "l_suppkey", F.expr(zkey).alias("zkey"))
    )

    base = tmp_path_factory.mktemp("zorder")
    zpath = str(base / "zordered")
    spath = str(base / "singlesort")
    # the production write shape: one range shuffle + in-partition sort
    (
        keyed.repartitionByRange(N_FILES, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    (
        l.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    dom_pk = ext.select(F.expr("hi_pk - lo_pk")).first()[0]
    dom_sk = ext.select(F.expr("hi_sk - lo_sk")).first()[0]
    return zpath, spath, dom_pk, dom_sk


def test_single_sort_prunes_only_one_dim(layouts):
    _, spath, dom_pk, dom_sk = layouts
    pk = _per_file_spans(spath, "l_partkey")
    sk = _per_file_spans(spath, "l_suppkey")
    # sorted dim: each file covers ~1/8 of the domain
    assert sum(pk) / len(pk) < 0.3 * dom_pk
    # unsorted dim: files cover (nearly) the whole domain — no pruning
    assert sum(sk) / len(sk) > 0.8 * dom_sk


def test_zorder_prunes_both_dims(layouts):
    zpath, spath, dom_pk, dom_sk = layouts
    zpk = _per_file_spans(zpath, "l_partkey")
    zsk = _per_file_spans(zpath, "l_suppkey")
    # both dims skip: 8 range splits consume ~3 high Morton bits, split
    # roughly 2:1 between the dims (sk holds the odd/high bits), so the
    # ideal is ~dom/2 for pk and ~dom/4 for sk, plus curve-jump files
    # that straddle a boundary
    assert sum(zpk) / len(zpk) < 0.7 * dom_pk
    assert sum(zsk) / len(zsk) < 0.5 * dom_sk
    # and the second dim beats the single-sort layout by a wide margin
    ssk = _per_file_spans(spath, "l_suppkey")
    assert sum(zsk) / len(zsk) < 0.6 * (sum(ssk) / len(ssk))
