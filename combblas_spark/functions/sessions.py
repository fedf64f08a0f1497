"""Gap-based sessionization of event streams.

The canonical clickstream/analytics operator: split each user's event
sequence into sessions wherever the inter-event gap exceeds a
threshold, then aggregate per session. The batch twin of Structured
Streaming's ``session_window`` (streaming/edges.py holds the streaming
side of this engine) — expressed with window functions so the whole
plan stays JVM-side and has an exact ANSI-SQL oracle.

Determinism/portability: gaps are compared in INTEGER microseconds
(Spark ``unix_micros`` vs DuckDB ``epoch_us`` — both exact), ordering
is (ts, event_id) so equal timestamps can't reorder across engines,
and the only double in the output is the rounded per-session value sum.

Scale: one hash exchange on the user key, then two windows over the
SAME (user, ts, id) sort — Spark reuses the sort for both (lag + running
sum), so the op costs one shuffle + one per-partition sort. Sessions
are inherently per-user sequential, so user-key partitioning is the
right (and only) parallel decomposition; a pathological single
mega-user is bounded by that user's own event count, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from combblas_spark.portable import pround


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Assign sessions and aggregate them: returns one row per session
    (user_id, session_start_us, n_events, min_event_id, duration_us
    [, sum_value]) where session_start_us identifies the session by its
    first event's microsecond timestamp. A session ends when the next
    event of the same user arrives more than ``gap_seconds`` later.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000
    # NTZ parquet timestamps cast through TIMESTAMP using the session
    # timezone — get_spark pins it to UTC, so this equals DuckDB's
    # epoch_us on the same naive value
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        us.alias("_us"),
        F.col(id_col).alias("_eid"),
        *([F.col(value_col).alias("_val")] if value_col else []),
        F.when(
            (us - F.lag(us).over(w)).isNull()
            | ((us - F.lag(us).over(w)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_us").asc(), F.col("_eid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("_sid", F.sum("_new").over(w2))
    aggs = [
        F.min("_us").alias("session_start_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("_eid").alias("min_event_id"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
    ]
    if value_col:
        aggs.append(pround(F.sum("_val")).alias("sum_value"))
    return (
        sessions.groupBy("user_id", "_sid")
        .agg(*aggs)
        .drop("_sid")
    )
