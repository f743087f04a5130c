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


def event_burstiness(
    df: DataFrame,
    ts: str = "ts",
    by: str = "entity_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-entity inter-arrival burstiness B = (sigma - mu)/(sigma + mu)
    and memory coefficient M = corr(gap_i, gap_{i+1}) (Goh & Barabasi,
    EPL 81:48002, 2008) over the ts-ordered event stream — the standard
    temporal-pattern pair for separating Poisson-like activity (B ~ 0)
    from bursty human/bot behaviour (B -> 1) and periodic heartbeats
    (B -> -1), per user, per device, per sensor.

    Cross-engine determinism: gaps are exact MICROSECOND longs
    (unix_micros / epoch_us on a UTC-pinned session); every moment
    (sum g, sum g^2, sum g_i*g_{i+1}, ...) accumulates in DECIMAL(38,0)
    (hugeint in the DuckDB twin) — exact integers, shuffle-order-free —
    and converts to double once, so both engines hit sqrt()/division
    with identical inputs. Population sigma (the paper's convention).

    Shape at scale: one lag window on the entity key + one grouped agg
    that reuses the same partitioning — 1 shuffle total, unbounded
    entity count; a hot entity wants the salted two-pass in
    operators/salting.py like every per-entity window here.

    Returns (by, n_events, mean_gap_s, burstiness_b, memory_m):
    entities with < 2 events drop (no gap); M is NULL below 3 gaps or
    on a constant leg (zero variance)."""
    order = [F.col("__us")] + ([F.col(tiebreak)] if tiebreak else [])
    d = df.select(
        F.col(by),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__us"),
        *([F.col(tiebreak)] if tiebreak else []),
    )
    w = Window.partitionBy(by).orderBy(*order)
    dec = "decimal(38,0)"
    g = (F.col("__us") - F.lag("__us").over(w)).cast(dec)
    d = d.withColumn("__g", g).withColumn("__gn", F.lead("__g").over(w))
    has_pair = F.col("__g").isNotNull() & F.col("__gn").isNotNull()

    def dsum(c):
        return F.coalesce(F.sum(c.cast(dec)), F.lit(0).cast(dec))

    agg = d.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__g").cast("long").alias("__m"),
        dsum(F.col("__g")).alias("__s1"),
        dsum(F.col("__g") * F.col("__g")).alias("__s2"),
        F.coalesce(
            F.sum(F.when(has_pair, F.lit(1))), F.lit(0)
        ).cast("long").alias("__np"),
        dsum(F.when(has_pair, F.col("__g"))).alias("__sx"),
        dsum(F.when(has_pair, F.col("__gn"))).alias("__sy"),
        dsum(F.when(has_pair, F.col("__g") * F.col("__gn"))).alias("__sxy"),
        dsum(F.when(has_pair, F.col("__g") * F.col("__g"))).alias("__sxx"),
        dsum(F.when(has_pair, F.col("__gn") * F.col("__gn"))).alias("__syy"),
    ).filter(F.col("__m") >= 1)
    m = F.col("__m").cast("double")
    mu = F.col("__s1").cast("double") / m
    var = F.col("__s2").cast("double") / m - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = F.when(sigma + mu != 0.0, (sigma - mu) / (sigma + mu))
    np_ = F.col("__np").cast("double")
    covn = np_ * F.col("__sxy").cast("double") - F.col("__sx").cast(
        "double"
    ) * F.col("__sy").cast("double")
    vxn = np_ * F.col("__sxx").cast("double") - F.col("__sx").cast(
        "double"
    ) * F.col("__sx").cast("double")
    vyn = np_ * F.col("__syy").cast("double") - F.col("__sy").cast(
        "double"
    ) * F.col("__sy").cast("double")
    mem = F.when(
        (F.col("__np") >= 3) & (vxn > 0.0) & (vyn > 0.0),
        covn / (F.sqrt(vxn) * F.sqrt(vyn)),
    )
    return agg.select(
        F.col(by),
        "n_events",
        (mu / F.lit(1_000_000.0)).alias("mean_gap_s"),
        b.alias("burstiness_b"),
        mem.alias("memory_m"),
    )


def transition_entropy(
    df: DataFrame,
    state: str = "event_type",
    ts: str = "ts",
    by: str = "entity_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-entity first-order Markov transition entropy of the ts-ordered
    categorical stream: H(next | cur) = sum_ij (c_ij/N) ln(N_i/c_ij) in
    nats, plus the stationary unigram entropy H(cur) and their ratio
    (predictability: H(next|cur)/H(cur) -> 0 for deterministic flows,
    -> 1 when the next state ignores the current one). The sequence-
    predictability feature behind session-model priors and bot detection.

    Cross-engine determinism: transition counts are exact longs; the two
    entropy sums fold SEQUENTIALLY over the (cur,next)-sorted cell array
    (bounded by |state alphabet|^2 per entity), so no shuffle-order float
    summation on either engine.

    Shape at scale: one entity-keyed shuffle feeds the lag window and the
    (entity,cur,next) count; the fold runs on per-entity cell arrays.
    Entities with < 2 events drop (no transition)."""
    order = [F.col("__ts")] + ([F.col(tiebreak)] if tiebreak else [])
    # states fold through a string-typed accumulator (and the oracle twin
    # sorts cells as varchar), so normalize the alphabet to string up front
    d = df.select(
        F.col(by),
        F.col(ts).alias("__ts"),
        F.col(state).cast("string").alias("__s"),
        *([F.col(tiebreak)] if tiebreak else []),
    )
    w = Window.partitionBy(by).orderBy(*order)
    d = d.withColumn("__p", F.lag("__s").over(w)).filter(
        F.col("__p").isNotNull()
    )
    cells = d.groupBy(by, "__p", "__s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_e = cells.groupBy(by).agg(
        F.sum("c").cast("long").alias("n_transitions"),
        F.array_sort(F.collect_list(F.struct("__p", "__s", "c"))).alias("__cells"),
    )
    # row totals per cur-state from the same sorted array (exact longs)
    row_tot = lambda cur: F.aggregate(  # noqa: E731
        "__cells",
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.when(s["__p"] == cur, s["c"]).otherwise(F.lit(0)),
    )
    n = F.col("n_transitions").cast("double")
    h_cond = F.aggregate(
        "__cells",
        F.lit(0.0),
        lambda acc, s: acc
        + (s["c"].cast("double") / n)
        * F.log(row_tot(s["__p"]).cast("double") / s["c"].cast("double")),
    )
    # unigram entropy of the CURRENT-state marginal: the sorted array
    # groups cells by cur state, so a first-of-run check inside the fold
    # visits each cur exactly once (row_tot rescans the array per cell —
    # O(cells^2) per entity, bounded by |alphabet|^4, alphabet ~ O(10))
    h_cur = F.aggregate(
        "__cells",
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0.0).alias("h"),
        ),
        lambda acc, s: F.struct(
            s["__p"].alias("prev"),
            (
                acc["h"]
                + F.when(
                    acc["prev"].isNull() | (acc["prev"] != s["__p"]),
                    (row_tot(s["__p"]).cast("double") / n)
                    * F.log(n / row_tot(s["__p"]).cast("double")),
                ).otherwise(F.lit(0.0))
            ).alias("h"),
        ),
        lambda acc: acc["h"],
    )
    return per_e.select(
        F.col(by),
        "n_transitions",
        h_cond.alias("h_cond"),
        h_cur.alias("h_cur"),
        F.when(h_cur != 0.0, h_cond / h_cur).alias("predictability_ratio"),
    )
