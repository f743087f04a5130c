"""Point-in-time snapshot aggregations: as-of-cutoff entity feature
snapshots (RFM) and time-bucketed OHLC bars.

Both are single-exchange grouped aggregations — the "feature snapshot"
complement to the per-event temporal windows in operators/windows.py.
Reference parity: the per-patient scoring-window rollups
(dssl/dssFunctionLibrary.R:876-917 aggregate tail; mpds
DSSL_Training_and_Evaluation.ipynb cell 20 per-user summaries),
generalized to the classic RFM / bar-chart shapes a feature store
serves.

Scale notes:
- rfm_snapshot filters on the cutoff BEFORE aggregating, so the
  predicate reaches the parquet scan (PushedFilters) and partial
  aggregation combines map-side; one shuffle on the entity key total.
- ohlc_bars keys the window AND the rollup on the identical
  (entity, bucket) pair, so Catalyst reuses one exchange for both; the
  open/close picks are rank-1 conditional aggregates, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_snapshot(
    df: DataFrame,
    *,
    entity: str,
    ts: str,
    amount: str,
    cutoff: str,
    recent_window_s: float = 90 * 86400.0,
) -> DataFrame:
    """Point-in-time RFM feature snapshot per entity, as of `cutoff`
    (an ISO timestamp string): recency / tenure in whole days, lifetime
    frequency and monetary value, plus the bounded recent-window
    (default 90 d) count and monetary — the conditional-aggregate
    multi-horizon trick, all in ONE grouped pass.

    Zero leakage: rows after the cutoff are dropped before any
    aggregate (and the filter is pushed into the scan). `amount` must
    already be an exact integer (e.g. cents); monetary sums stay
    integers until the caller divides once.

    Returns (entity, frequency, recency_days, tenure_days,
    monetary_c, n_recent, monetary_recent_c, last_ts_s)."""
    cut = F.unix_micros(F.lit(cutoff).cast("timestamp"))
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    lo = cut - F.lit(int(round(recent_window_s * 1_000_000)))
    # filter on the RAW timestamp column (cast the literal to its exact
    # type) so the cutoff predicate reaches the parquet scan as a
    # PushedFilter — filtering the derived epoch expression would not
    # push. Session tz is UTC-pinned, so NTZ/LTZ agree.
    cut_lit = F.lit(cutoff).cast(df.schema[ts].dataType)
    d = (
        df.filter(F.col(ts) <= cut_lit)
        .select(F.col(entity), us.alias("__us"),
                F.col(amount).alias("__amt"))
    )
    recent = F.col("__us") >= lo
    day_us = F.lit(86400 * 1_000_000).cast("long")
    return (
        d.groupBy(entity)
        .agg(
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.max("__us").alias("__last"),
            F.min("__us").alias("__first"),
            F.sum(F.col("__amt").cast("decimal(38,0)"))
            .alias("monetary_c"),
            F.coalesce(F.sum(F.when(recent, F.lit(1))), F.lit(0))
            .cast("long").alias("n_recent"),
            F.coalesce(
                F.sum(F.when(recent, F.col("__amt"))
                      .cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("monetary_recent_c"),
        )
        .select(
            entity,
            "frequency",
            F.floor((cut - F.col("__last")) / day_us).cast("long")
            .alias("recency_days"),
            F.floor((cut - F.col("__first")) / day_us).cast("long")
            .alias("tenure_days"),
            "monetary_c",
            "n_recent",
            "monetary_recent_c",
            (F.col("__last").cast("double") / F.lit(1e6))
            .alias("last_ts_s"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    *,
    entity: str,
    ts: str,
    value: str,
    tiebreak: str,
    bucket_s: int = 86400,
) -> DataFrame:
    """Per-entity time-bucketed OHLC bars: open = value of the FIRST
    event in the bucket, close = the LAST, high/low = max/min, plus the
    event count — deterministic under timestamp ties via `tiebreak`
    (a unique column ordered alongside the timestamp).

    `value` must be an exact integer (e.g. cents) so min/max/open/close
    agree bit-for-bit across engines. The first/last picks are
    row_number() = 1 conditional aggregates over the same
    (entity, bucket) partition the rollup groups on — one exchange
    feeds both windows and the aggregate, and there is no
    "self-join back for the open row" anti-pattern.

    Returns (entity, bar_start_s, n_events, open_c, high_c, low_c,
    close_c)."""
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    bucket_us = int(bucket_s) * 1_000_000
    d = df.select(
        F.col(entity),
        us.alias("__us"),
        F.col(value).alias("__v"),
        F.col(tiebreak).alias("__tb"),
    ).withColumn(
        "__bar", (F.floor(F.col("__us") / F.lit(bucket_us))).cast("long")
    )
    asc = Window.partitionBy(entity, "__bar").orderBy("__us", "__tb")
    desc = Window.partitionBy(entity, "__bar").orderBy(
        F.desc("__us"), F.desc("__tb")
    )
    d = d.withColumn("__ra", F.row_number().over(asc)).withColumn(
        "__rd", F.row_number().over(desc)
    )
    return (
        d.groupBy(entity, "__bar")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(F.when(F.col("__ra") == 1, F.col("__v")))
            .alias("open_c"),
            F.max("__v").alias("high_c"),
            F.min("__v").alias("low_c"),
            F.max(F.when(F.col("__rd") == 1, F.col("__v")))
            .alias("close_c"),
        )
        .select(
            entity,
            (F.col("__bar") * F.lit(float(bucket_s))).alias("bar_start_s"),
            "n_events",
            "open_c",
            "high_c",
            "low_c",
            "close_c",
        )
    )
