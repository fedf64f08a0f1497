"""Streaming sessionization: the Structured Streaming twin of
functions.sessions.sessionize, built on the native ``session_window``
operator (gap-merged event-time windows with watermark-bounded state).

Semantics note (documented, deliberate): ``session_window`` merges an
event into the current session while it arrives STRICTLY BEFORE
session_end = last_event + gap, i.e. it splits at inter-event
diff >= gap; the batch twin splits at diff > gap (strict), because that
is the rule its DuckDB oracle replays. The two agree on every input
whose inter-event gaps never equal the threshold exactly — the
equivalence test uses such inputs and asserts bit-equality of the
session aggregates.

Scale design: session_window is Spark's purpose-built stateful
operator for this — per-key (user) state bounded by the watermark, no
global sort, sessions finalize and leave state as event time advances.
The aggregate columns mirror the batch op so downstream consumers can
swap batch/stream sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from combblas_spark.portable import pround


def streaming_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user gap sessions over a streaming events DataFrame: returns
    the streaming aggregate (user_id, session_start_us, n_events,
    min_event_id, duration_us, sum_value) — the same output shape as
    the batch ``sessionize``. duration_us is max-min EVENT time (not
    the padded window end, which includes the gap)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds"),
            F.col(user_col).alias("user_id"),
        )
        .agg(
            F.min(us).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.min(id_col).alias("min_event_id"),
            (F.max(us) - F.min(us)).alias("duration_us"),
            pround(F.sum(value_col)).alias("sum_value"),
        )
        .drop("session_window")
    )


def run_streaming_sessions(
    spark,
    input_dir: str,
    query_name: str,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
):
    """Drain ``input_dir`` (file-source event parquet drops) through
    streaming_sessions into an in-memory table ``query_name`` (complete
    mode — every micro-batch re-emits the full current session table,
    which is what a dashboard sink wants; swap for append + a real sink
    in deployment, where the watermark finalizes sessions)."""
    from combblas_spark.streaming.edges import read_event_stream

    sess = streaming_sessions(
        read_event_stream(spark, input_dir),
        gap_seconds=gap_seconds, watermark=watermark)
    return (
        sess.writeStream.format("memory").queryName(query_name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
