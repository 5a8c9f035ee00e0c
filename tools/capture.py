"""Optimization-round tooling: capture .explain("formatted") plans and
noop-sink timings for named registry queries (guide §1.1/§1.4/§1.5).

Usage:
  python tools/capture.py plan  <suffix> q1 q2 ...   # plans/$ROUND/<q>_<suffix>.txt
  python tools/capture.py time  <n_runs> q1 q2 ...   # noop-sink timings to stdout

Honors SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, and
SPARK_GRAFT_PLAN_ROUND (default r14) for the plans/ subdirectory.
Not part of the driver contract or the bench; measurement-only.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solarflare_etl_pipeline_spark.registry import load_all
from solarflare_etl_pipeline_spark.session import get_spark


def main() -> None:
    mode = sys.argv[1]
    arg = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-capture")
    specs = load_all()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    round_dir = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")

    if mode == "plan":
        os.makedirs(os.path.join(here, "plans", round_dir), exist_ok=True)
        for name in names:
            df = specs[name].spark(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(here, "plans", round_dir, f"{name}_{arg}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"[plan] wrote {out} ({len(buf.getvalue())} chars)")
    elif mode == "time":
        n = int(arg)
        # warm the session once so the first query isn't charged startup
        from solarflare_etl_pipeline_spark.catalog import table

        table(spark, sf_dir, "events").count()
        for name in names:
            runs = []
            for _ in range(n):
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.perf_counter()
                df = specs[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
            print(
                f"[time] {name}: best={min(runs):.2f}s "
                f"runs={[round(r, 2) for r in runs]}",
                flush=True,
            )
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
