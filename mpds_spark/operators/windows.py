"""Per-entity, time-ordered window operators.

Everything here is pure Spark SQL window expressions — whole-stage-codegen
JVM execution, no Python in the hot path. One logical range exchange on the
entity key feeds every window in a stage (Catalyst reuses the partitioning
across same-keyed windows).

Reference parity:
- derived_features  ← dssl/dssFunctionLibrary.R:876-917
  (extractDSSFeaturesForEachPatient: expanding cumsum/cummax windows,
  strictly backward-looking — zero temporal leakage by construction).
- lag_lead_diff     ← dssl/dssFunctionLibrary.R:887-893 (abs_diff_dss, diff_ht)
- interleave_split  ← mpds/DSSL_Training_and_Evaluation.ipynb cell 5
  (before = even positional rows, after = odd), re-expressed as an
  order-derived window (never physical row position).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from mpds_spark.functions.timeutil import epoch_seconds


def entity_window(entity: str = "entity_id", ts: str = "ts") -> WindowSpec:
    return Window.partitionBy(entity).orderBy(ts)


def expanding(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def _nan_to_zero(c: Column) -> Column:
    # R parity: res_df[is.na(res_df)] = 0 — in R is.na(NaN) is TRUE, so both
    # SQL NULL and NaN become 0 (but +/-Inf is preserved, as in R).
    return F.when(c.isNull() | F.isnan(c), F.lit(0.0)).otherwise(c)


def lag_lead_diff(
    df: DataFrame,
    value: str,
    entity: str = "entity_id",
    ts: str = "ts",
    prefix: str | None = None,
) -> DataFrame:
    """Per-entity first differences of value and time.

    Parity: dssFunctionLibrary.R:887-893 — first row of each entity gets
    abs_diff=0 and diff_ts=1 (the reference's documented defaults).
    """
    p = prefix or value
    w = entity_window(entity, ts)
    dv = F.col(value) - F.lag(value, 1).over(w)
    te = epoch_seconds(df, ts)
    dt = te - F.lag(te, 1).over(w)
    return (
        df.withColumn(f"{p}_diff", F.coalesce(dv, F.lit(0.0)))
        .withColumn(f"{p}_abs_diff", F.coalesce(F.abs(dv), F.lit(0.0)))
        .withColumn("diff_ts", F.coalesce(F.abs(dt), F.lit(1.0)))
    )


def derived_features(
    df: DataFrame,
    value: str = "dss",
    entity: str = "entity_id",
    ts: str = "ts",
) -> DataFrame:
    """The 8 expanding-window per-entity features of the reference.

    Parity: dssl/dssFunctionLibrary.R:876-917 (extractDSSFeaturesForEachPatient).
    All frames are rowsBetween(unboundedPreceding, currentRow): strictly
    backward-looking (leakage-safe). NaN/NULL → 0 as in the reference's
    res_df[is.na(res_df)] = 0.

    Scale: a single WindowExec pass per entity partition — O(n) expanding
    aggregates, no self-join, no shuffle beyond the one entity exchange.
    """
    w = entity_window(entity, ts)
    we = expanding(w)
    t = epoch_seconds(df, ts)
    v = F.col(value)

    line_num = F.row_number().over(w)
    cum = lambda c: F.sum(c).over(we)  # noqa: E731

    dv = v - F.lag(value, 1).over(w)
    dt = t - F.lag(t, 1).over(w)
    abs_diff = F.coalesce(F.abs(dv), F.lit(0.0))
    diff_t = F.coalesce(F.abs(dt), F.lit(1.0))
    signed_diff = F.coalesce(dv, F.lit(0.0))
    abs_rate = abs_diff / diff_t
    rate = signed_diff / diff_t

    cumsum_ht = cum(t)
    cumsum_ht_sq = cum(t * t)

    out = (
        df.withColumn("dss_avg", cum(v) / line_num)
        .withColumn("dss_ht_avg", cum(v * t) / cumsum_ht)
        .withColumn("dss_ht_sq_avg", cum(v * t * t) / cumsum_ht_sq)
        .withColumn("dss_max", F.max(v).over(we))
        .withColumn("dss_min", F.min(v).over(we))
        .withColumn("dss_rate_avg", cum(rate) / line_num)
        .withColumn("dss_rate_ht_avg", cum(rate * t) / cumsum_ht)
        .withColumn("dss_abs_rate_avg", cum(abs_rate) / line_num)
        .withColumn("dss_abs_rate_ht_avg", cum(abs_rate * t) / cumsum_ht)
    )
    feat_cols = [
        "dss_avg",
        "dss_ht_avg",
        "dss_ht_sq_avg",
        "dss_max",
        "dss_min",
        "dss_rate_avg",
        "dss_rate_ht_avg",
        "dss_abs_rate_avg",
        "dss_abs_rate_ht_avg",
    ]
    for c in feat_cols:
        out = out.withColumn(c, _nan_to_zero(F.col(c)))
    return out


def interleave_split(
    df: DataFrame,
    entity: str = "entity_id",
    ts: str = "ts",
    col_name: str = "phase",
) -> DataFrame:
    """Label alternating rows per entity: 0 = "before", 1 = "after".

    Parity: NB cell 5 iloc[::2]/iloc[1::2] — but order-derived via
    row_number over (entity, ts), never physical position. Adds `pair_id`
    (floor((rn-1)/2)) so before/after rows of the same visit share a key.
    """
    w = entity_window(entity, ts)
    rn = F.row_number().over(w)
    return df.withColumn(col_name, ((rn + 1) % 2).cast("int")).withColumn(
        "pair_id", F.floor((rn - 1) / 2).cast("long")
    )


def per_group_max(
    df: DataFrame, key: str, value: str, alias: str = "max_value"
) -> DataFrame:
    """Parity: dssPerformanceEvaluation.R:49-58 (per-user max score)."""
    return df.groupBy(key).agg(F.max(value).alias(alias))


def series_stats(
    df: DataFrame,
    value: str = "value",
    ts: str = "ts",
    by: str = "entity_id",
) -> DataFrame:
    """Per-entity sequence kernels that ARE window-expressible — the
    table-level twin of functions/kernels.py's ZCR.m (:sum(abs(diff(
    x>0)))/n), FeatureMeanTKEO.m (mean of interior x_i^2 - x_{i+1}
    x_{i-1}) and FeatureAR1.m (no-intercept OLS of x_i on x_{i-1}),
    computed over the ts-ordered value series of every entity in ONE
    lag/lead window + one grouped aggregation (entity count and series
    length unbounded; the non-window kernels — fastdfa, Lomb-Scargle —
    stay in the Arrow tier).

    Returns (by, n, zcr, tkeo_mean, ar1); tkeo NULL below 3 points, ar1
    NULL below 2 or on a zero denominator, matching the kernels' NaN.
    """
    d = df.select(
        F.col(by), F.col(ts).alias("__ts"), F.col(value).cast("double").alias("__x")
    ).filter(F.col("__x").isNotNull())
    w = Window.partitionBy(by).orderBy("__ts")
    d = d.withColumn("__p", F.lag("__x").over(w)).withColumn(
        "__nx", F.lead("__x").over(w)
    )
    pos = F.col("__x") > 0
    ppos = F.col("__p") > 0
    agg = d.groupBy(by).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__p").isNotNull(),
                        F.abs(pos.cast("int") - ppos.cast("int")),
                    )
                ),
                F.lit(0),
            )
            / F.count(F.lit(1))
        ).alias("zcr"),
        F.avg(
            F.when(
                F.col("__p").isNotNull() & F.col("__nx").isNotNull(),
                F.col("__x") * F.col("__x") - F.col("__nx") * F.col("__p"),
            )
        ).alias("tkeo_mean"),
        F.sum(F.when(F.col("__p").isNotNull(), F.col("__p") * F.col("__x"))).alias("__num"),
        F.sum(F.when(F.col("__p").isNotNull(), F.col("__p") * F.col("__p"))).alias("__den"),
    )
    return agg.select(
        F.col(by),
        "n",
        "zcr",
        "tkeo_mean",
        F.when(F.col("__den") != 0, F.col("__num") / F.col("__den")).alias("ar1"),
    )
