"""Streaming exact deduplication: the stream twin of
operators/dedup.exact_dedup.

State = one row per distinct content hash (dropDuplicates state store).
Unbounded by default — for production pass `watermark` + an event-time
column so Spark ages out state with dropDuplicatesWithinWatermark (dups
further apart than the watermark are then NOT collapsed: the standard
state-bound trade-off, same as any streaming dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    df: DataFrame,
    text: str = "text",
    ts: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Keep the FIRST-arriving row per distinct md5(text). Works on a
    streaming DataFrame (stateful dropDuplicates) and on a batch one (same
    expression — the batch twin keeps an arbitrary-but-single row per
    hash, matching exact_dedup's group count)."""
    d = df.withColumn("text_hash", F.md5(text))
    if watermark is not None:
        if ts is None:
            raise ValueError("watermark requires an event-time column (ts=)")
        return d.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return d.dropDuplicates(["text_hash"])
