"""Round-14 A/B (VERDICT r13 #7): HDFS-backed vs RocksDB state-store
provider for the stream_*_live family at sf0.1.

The provider is a session conf (captured at query start), so each
variant runs in its own PROCESS; invoke this script once per provider
and interleave invocations A/B/A/B to ride out box drift:

  python tools/exp_r14e.py hdfs
  python tools/exp_r14e.py rocksdb

Times the stateful live ops (update-mode agg, watermarked dedup,
session window, sliding window, tumbling append, interval join) with
the standard count() action, 2 runs each, fresh checkpoints per run
(the ops tag checkpoint dirs by pid, so runs in a fresh process never
resume). Measurement-only tooling.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = (
    "stream_update_mode_live",
    "stream_dedup_live",
    "stream_session_live",
    "stream_sliding_live",
    "stream_tumbling_live",
    "stream_interval_join_live",
)


def main() -> None:
    provider = sys.argv[1] if len(sys.argv) > 1 else "hdfs"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from solarflare_etl_pipeline_spark.registry import load_all
    from solarflare_etl_pipeline_spark.session import get_spark

    spark = get_spark(f"r14-statestore-{provider}")
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    specs = load_all()
    from solarflare_etl_pipeline_spark.catalog import table

    table(spark, sf_dir, "events").count()  # warm

    for name in OPS:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 2))
        print(f"[ab] {provider} {name}: best={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
