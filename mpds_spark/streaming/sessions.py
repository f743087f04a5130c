"""Structured Streaming surface (stretch goal, SURVEY.md §2.10).

The reference is entirely batch; the engine's streaming surface covers the
one construct with a native streaming analogue — gap sessionization — via
F.session_window, plus a watermarked event-time aggregation. Both are
defined once as query builders usable on a batch OR streaming DataFrame
(session_window works in batch too, which is how the equivalence test pins
streaming semantics to the batch sessionize operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_agg(
    df: DataFrame,
    gap: str = "30 minutes",
    entity: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per (entity, session) aggregate using the native session_window.

    On a streaming df pass `watermark` (e.g. "1 hour") to bound state; on a
    batch df leave it None. Emits one row per closed session:
    (entity, session_start, session_end, n_events, sum_value).
    """
    if watermark is not None:
        df = df.withWatermark(ts, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts), gap).alias("w"), F.col(entity))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("sum_value"),
        )
        .select(
            entity,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_sessions_from_files(
    spark,
    source_dir: str,
    schema: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity: str = "user_id",
    ts: str = "ts",
    value: str = "value",
):
    """File-source streaming sessionization: readStream(parquet) →
    session_window agg → ready for writeStream (update/append mode)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return session_agg(
        stream, gap=gap, entity=entity, ts=ts, value=value, watermark=watermark
    )


def tumbling_counts(
    df: DataFrame,
    window: str = "1 hour",
    entity: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window event-time aggregation — the standard
    streaming rollup (count + sum per (window, entity)).

    On a streaming df pass `watermark` so Spark bounds state and drops
    too-late rows (append mode emits a window once the watermark passes
    its end; complete mode re-emits everything — deterministic over a
    finite source, which is how the catalog query gates it). Works on a
    batch df with watermark=None for the equivalence oracle.

    Returns (entity, window_start, window_end, n_events, sum_value)."""
    if watermark is not None:
        df = df.withWatermark(ts, watermark)
    return (
        df.groupBy(F.window(F.col(ts), window).alias("w"), F.col(entity))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("sum_value"),
        )
        .select(
            entity,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )
