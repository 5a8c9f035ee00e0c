"""Custom stateful streaming operator via ``applyInPandasWithState``.

The mandate's escape hatch for stateful logic Structured Streaming's
built-ins can't express (SURVEY.md §2.2's UDF row, streaming-shaped):
a per-user running aggregator that maintains (event count, value sum,
last event time) across micro-batches and emits one updated row per
user per batch.

Scale notes: state lives in the state store keyed by user_id — O(keys)
not O(events); a processing-time timeout (``GroupStateTimeout``) is the
knob that bounds state for abandoned keys.  Spark 4's successor API
(``transformWithStateInPandas``: typed ValueState/ListState/MapState,
timers, RocksDB-only) is the forward path, but its Python worker
imports ``google.protobuf``, which this container does not ship — so
the engine stays on ``applyInPandasWithState`` (verified here and, with
the RocksDB provider, in tests/test_streaming.py) and the processor
port is mechanical when protobuf is available.  The same grouped-map shape
runs in batch mode via ``applyInPandas`` (registered as
``udtf_grouped_state`` there — oracle-checkable), so the logic is
testable both ways with one implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from solarflare_etl_pipeline_spark.catalog import table
from solarflare_etl_pipeline_spark.registry import register

STATE_SCHEMA = "n_events LONG, total_value DOUBLE, last_ts TIMESTAMP"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _accumulate(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one user into running state."""
    (user_id,) = key
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        # integer-cents accumulation: order-independent (oracle-stable)
        total = (round(total * 100) + int((pdf["value"] * 100).round().sum())) / 100.0
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Streaming form: per-user running totals across micro-batches."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@register(
    "udtf_grouped_state",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
               MAX(CAST(ts AS TIMESTAMP)) AS last_ts
        FROM events
        GROUP BY user_id
    """,
    doc="Batch twin of the stateful streaming aggregator (same grouped-map logic via "
    "applyInPandas): per-user totals with integer-cents arithmetic. The streaming form "
    "(applyInPandasWithState, bounded state per key) is exercised in tests/test_streaming.py.",
)
def udtf_grouped_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    def batch_fold(pdf: pd.DataFrame) -> pd.DataFrame:
        total = int((pdf["value"] * 100).round().sum()) / 100.0
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [total],
                "last_ts": [pdf["ts"].max()],
            }
        )

    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(batch_fold, OUTPUT_SCHEMA)


CUSUM_STATE_SCHEMA = "cusum3 LONG, n_seen LONG"
CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("cusum3", T.LongType()),
    ]
)


def stateful_cusum_alarms(
    events: DataFrame, baselines: DataFrame, threshold3: int
) -> DataFrame:
    """Streaming twin of the batch ``ts_cusum_drift`` operator (Page's
    CUSUM, operators/timeseries.py): per-key drift statistic
    S = max(0, S + (v3 - target3)) carried across micro-batches in the
    state store, alarm rows emitted the moment S crosses ``threshold3``.

    ``baselines`` is a STATIC (user_id, mean3) table — the batch-computed
    targets, joined stream-static before the stateful fold (the lambda
    architecture seam: batch owns the baseline, streaming owns the
    incremental statistic). Inside a micro-batch events are folded in
    (ts, event_id) order; cross-batch order is arrival order, the
    standard CUSUM operating regime (a late event re-orders the
    statistic only within its own batch — bounded by the source's
    delivery discipline, same caveat as any sequential detector fed by
    a stream). State is two BIGINTs per key — O(keys), never O(events).
    """

    def fold(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        s, n_seen = state.get if state.exists else (0, 0)
        out_ids, out_vals = [], []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for event_id, v3, mean3 in zip(
                pdf["event_id"], pdf["v3"], pdf["mean3"]
            ):
                s = max(0, s + (int(v3) - int(mean3)))
                n_seen += 1
                if s >= threshold3:
                    out_ids.append(int(event_id))
                    out_vals.append(s)
        state.update((s, n_seen))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(out_ids), dtype="int64"),
                "event_id": pd.Series(out_ids, dtype="int64"),
                "cusum3": pd.Series(out_vals, dtype="int64"),
            }
        )

    quantized = events.withColumn(
        "v3", F.expr("CAST(FLOOR(value * 1000) AS BIGINT)")
    ).join(baselines, "user_id")  # stream-static equi join: broadcastable
    return quantized.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
