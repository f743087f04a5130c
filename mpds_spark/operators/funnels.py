"""Cohort retention and ordered conversion funnels over the event stream.

Product-analytics staples re-expressed as the engine's temporal
primitives: retention is a first-event as-of anchor + week bucketing
(the same point-in-time discipline as operators/asof.py — a user's
cohort is decided only by events at or before each activity week, zero
leakage); the funnel is a forward-chained sequence of conditional
first-occurrence scans, i.e. the per-entity ordered state machine the
reference builds for reaction chains (dssl/dssFunctionLibrary.R:119-171
pair generation; functions/battery.py reaction-lag state machine),
collapsed to stage counts.

Every statistic is integer-exact (counts, microsecond sums) until one
final division, so both engines agree bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retention_cohorts(
    df: DataFrame,
    ts: str = "ts",
    by: str = "entity_id",
) -> DataFrame:
    """Weekly cohort retention matrix: entities are cohorted by the ISO
    week (Monday-truncated) of their FIRST event; each (cohort_week,
    week_offset) cell counts entities active in that later week, with
    the retention rate vs the cohort's size (its offset-0 cell — every
    entity is active in its own first week by construction).

    Cross-engine determinism: pure integer counts and day arithmetic;
    the one double is the final rate division.

    Shape at scale: ONE entity-keyed agg collapses the raw stream to
    (entity, min week, distinct-week set) — the per-entity set is
    bounded by weeks-of-history (~52/year) — then one (cohort, offset)
    count over the exploded entity-weeks, then one window over the
    cohort-sized aggregate frame (|cohorts| x |offsets| rows) pulls the
    offset-0 cell as the cohort size. Three exchanges, a single source
    scan, nothing re-reads or self-joins the corpus.

    Returns (cohort_week: date, week_offset, n_active, cohort_size,
    retention)."""
    week = F.to_date(F.date_trunc("week", F.col(ts).cast("timestamp")))
    per_user = (
        df.select(F.col(by), week.alias("__w"))
        .groupBy(by)
        .agg(
            F.min("__w").alias("__w0"),
            F.collect_set("__w").alias("__ws"),
        )
    )
    cells = (
        per_user.select(
            F.col("__w0").alias("cohort_week"),
            F.explode("__ws").alias("__w"),
        )
        .select(
            "cohort_week",
            ((F.datediff(F.col("__w"), F.col("cohort_week")) / 7)
             .cast("long")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort_week"))
    return cells.withColumn("cohort_size", size).select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double"))
        .alias("retention"),
    )


def conversion_funnel(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    event_type: str = "event_type",
    ts: str = "ts",
    by: str = "entity_id",
    within: float | None = None,
) -> DataFrame:
    """Ordered conversion funnel: per entity, the first `steps[0]` event,
    then the first `steps[1]` STRICTLY AFTER it, then the first
    `steps[2]` strictly after that, ... (each within `within` seconds of
    the previous step when set). The entity's stage is the length of the
    completed chain; the output is one row per stage with the entity
    count and the mean seconds from the chain's first to its last step.

    Cross-engine determinism: timestamps become exact microsecond longs;
    stage membership and the lag sums are integer-exact, divided once.

    Shape at scale: ONE entity-keyed shuffle feeds the whole chain —
    each step is a conditional full-partition min that references the
    previous step's column, so Catalyst stacks k WindowExecs on the same
    exchange; the stage rollup aggregates k+1 rows. No self-joins, no
    per-entity arrays.

    Returns (stage, step, n_entities, mean_s_to_stage): `step` names the
    last completed step (NULL at stage 0); mean_s_to_stage is 0 at stage
    1 and NULL at stage 0."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    d = df.select(
        F.col(by), F.col(event_type).alias("__et"), us.alias("__us")
    )
    full = Window.partitionBy(by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lim = None if within is None else int(round(within * 1_000_000))
    prev = None
    for i, s in enumerate(steps):
        cond = F.col("__et") == s
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (
                F.col("__us") > F.col(prev)
            )
            if lim is not None:
                cond = cond & (F.col("__us") <= F.col(prev) + F.lit(lim))
        col = f"__t{i}"
        d = d.withColumn(col, F.min(F.when(cond, F.col("__us"))).over(full))
        prev = col
    one = d.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy(by).orderBy("__us", "__et")),
    ).filter(F.col("__rn") == 1)
    # ascending wrap order => the OUTERMOST when checks the deepest step
    # (t_i non-null implies t_{i-1} non-null, so deepest must win)
    stage = F.lit(0).cast("int")
    for i in range(len(steps)):
        stage = F.when(
            F.col(f"__t{i}").isNotNull(), F.lit(i + 1).cast("int")
        ).otherwise(stage)
    lag_us = F.lit(None).cast("long")
    for i in range(1, len(steps)):
        lag_us = F.when(
            F.col(f"__t{i}").isNotNull(), F.col(f"__t{i}") - F.col("__t0")
        ).otherwise(lag_us)
    lag_us = F.when(
        F.col("__t0").isNotNull(), F.coalesce(lag_us, F.lit(0).cast("long"))
    )
    per_entity = one.select(
        F.col(by), stage.alias("stage"), lag_us.alias("__lag")
    )
    step_name = F.element_at(
        F.array(*[F.lit(s) for s in steps]), F.col("stage")
    )
    return (
        per_entity.groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entities"),
            F.sum("__lag").cast("long").alias("__lag_sum"),
        )
        .select(
            "stage",
            F.when(F.col("stage") > 0, step_name).alias("step"),
            "n_entities",
            F.when(
                F.col("stage") > 0,
                F.col("__lag_sum").cast("double")
                / (F.col("n_entities").cast("double") * 1e6),
            ).alias("mean_s_to_stage"),
        )
    )


def temporal_motifs(
    df: DataFrame,
    entity: str = "entity_id",
    ts: str = "ts",
    kind: str = "event_type",
    max_span: float = 600.0,
    k: int = 20,
    tiebreak: tuple = (),
) -> DataFrame:
    """Temporal motif counts (Paranjape et al. 2017's consecutive-event
    specialization): the top-k (type1 -> type2 -> type3) triples of
    CONSECUTIVE events on one entity whose total span t3 - t1 fits in
    `max_span` seconds — the short-sequence behavioral signature behind
    bot detection and intent features (view->click->purchase vs
    error->error->error).

    Shape at scale: two lead() columns and the span predicate share ONE
    entity-keyed exchange; the motif rollup groups on the tiny
    (|types|^3-bounded) key; top-k via TakeOrderedAndProject. Counts
    exact longs; ties break (count desc, t1, t2, t3). `tiebreak` extends
    the per-entity event order past equal timestamps (pass a unique id
    column for cross-engine determinism).
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    span_us = int(round(float(max_span) * 1e6))
    w = Window.partitionBy(entity).orderBy("__us", *tiebreak)
    d = (
        df.select(
            F.col(entity), us.alias("__us"), F.col(kind), *tiebreak
        )
        .withColumn("__k2", F.lead(kind, 1).over(w))
        .withColumn("__k3", F.lead(kind, 2).over(w))
        .withColumn("__us3", F.lead("__us", 2).over(w))
    )
    return (
        d.filter(
            F.col("__k3").isNotNull()
            & (F.col("__us3") - F.col("__us") <= span_us)
        )
        .groupBy(
            F.col(kind).alias("t1"),
            F.col("__k2").alias("t2"),
            F.col("__k3").alias("t3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(int(k))
    )


def linear_attribution(
    events: DataFrame,
    entity: str = "entity_id",
    ts: str = "ts",
    kind: str = "event_type",
    value: str = "value",
    conversion: str = "purchase",
    touch_kinds: tuple = ("view", "click"),
    lookback: float = 7 * 86400.0,
    event_id: str = "event_id",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value is split
    equally across its touch events inside the lookback window, then
    rolled up per touch type — the marketing-mix sibling of the
    conversion funnel. Conversions with zero touches land in the
    '(none)' bucket whole.

    Cross-engine determinism: per-conversion touch counts are exact
    longs; each conversion contributes cents * n_type / n_total (ONE
    double division); the per-type totals fold contributions sorted by
    conversion id on BOTH engines (the token_entropy pinned-order
    convention). At 10^12 conversions the pinned-order fold becomes a
    hierarchical two-level fold (per-bucket then bucket-ordered) — the
    same trade documented on ewma_features.

    Shape at scale: the touch-window match is the interval-join shape —
    entity equi-key drives the join, the time range is a post-filter;
    counts and the type rollup are conversion-/type-keyed aggs.

    Returns (touch_type, n_conversions, n_touches, attributed_value).
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    back_us = int(round(float(lookback) * 1e6))
    scale = 100
    cents = (
        F.signum(F.col(value))
        * F.floor(F.abs(F.col(value)) * scale + F.lit(0.5))
    ).cast("long")
    conv = events.filter(F.col(kind) == conversion).select(
        F.col(entity).alias("__e"),
        us.alias("__cu"),
        cents.alias("__cents"),
        F.col(event_id).alias("__cid"),
    )
    touch = events.filter(
        F.col(kind).isin(list(touch_kinds))
    ).select(
        F.col(entity).alias("__e2"),
        us.alias("__tu"),
        F.col(kind).alias("__tk"),
    )
    matched = conv.join(
        touch,
        (F.col("__e") == F.col("__e2"))
        & (F.col("__tu") <= F.col("__cu"))
        & (F.col("__tu") > F.col("__cu") - F.lit(back_us)),
        "left",
    )
    per_conv = matched.groupBy("__cid", "__cents").agg(
        F.count("__tk").cast("long").alias("__n")
    )
    per_type = matched.filter(F.col("__tk").isNotNull()).groupBy(
        "__cid", "__tk"
    ).agg(F.count(F.lit(1)).cast("long").alias("__nt"))
    typed = per_type.join(per_conv, "__cid").select(
        "__cid",
        "__tk",
        "__nt",
        (
            F.col("__cents").cast("double")
            * F.col("__nt").cast("double")
            / F.col("__n").cast("double")
            / F.lit(float(scale))
        ).alias("__contrib"),
    )
    untouched = per_conv.filter(F.col("__n") == 0).select(
        "__cid",
        F.lit("(none)").alias("__tk"),
        F.lit(0).cast("long").alias("__nt"),
        (F.col("__cents").cast("double") / F.lit(float(scale))).alias(
            "__contrib"
        ),
    )
    allc = typed.unionByName(untouched)
    return allc.groupBy(F.col("__tk").alias("touch_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum("__nt").cast("long").alias("n_touches"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("__cid"), F.col("__contrib")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["__contrib"],
        ).alias("attributed_value"),
    )


def window_funnel(
    df: DataFrame,
    chain: tuple = ("view", "click", "purchase"),
    window_us: int = 48 * 3600 * 1000000,
    event: str = "event_type",
    ts: str = "ts",
    by: str = "entity_id",
) -> DataFrame:
    """ClickHouse-windowFunnel-style strict-order chain depth: the
    deepest k such that the entity produced chain[0..k-1] events IN
    TIME ORDER with every step landing within `window_us` of the
    CHAIN-START event. The sliding-window funnel product analytics
    runs on raw streams (reference analogue: the ordered reaction
    chains of dssl/dssFunctionLibrary.R:119-171, collapsed to a
    max-depth statistic).

    Algorithm: one sequential fold over the ts-sorted event array with
    an all-integer state s[i] = latest chain-start micros of any chain
    that has reached level i (-1 = unreached). Latest-start dominance:
    the within-window constraint t - start <= W only loosens as the
    start grows, and every recorded chain saw its level events in fold
    (= time) order — so keeping the max start is lossless. All state
    is exact longs; the gate needs no rounding at all.

    Shape at scale: ONE entity-keyed exchange, O(n) fold per entity
    inside codegen (the ewma/holt contract). The DuckDB twin must fold
    a LIST accumulator (struct-result lambdas rebind mid-struct —
    see holt_trend).

    Returns (by, n_events, funnel_depth) with depth in 0..len(chain)."""
    K = len(chain)
    W = int(window_us)
    d = df.select(
        F.col(by),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__t"),
        F.col(event).alias("__e"),
    )
    g = d.groupBy(by).agg(
        F.array_sort(
            F.collect_list(F.struct("__t", "__e"))
        ).alias("__a"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    init = "array(" + ", ".join(["-1L"] * K) + ")"
    steps = [f"IF(x.__e = '{chain[0]}', greatest(acc[0], x.__t), acc[0])"]
    for i in range(1, K):
        steps.append(
            f"IF(x.__e = '{chain[i]}' AND acc[{i-1}] >= 0L "
            f"AND x.__t - acc[{i-1}] <= {W}L, "
            f"greatest(acc[{i}], acc[{i-1}]), acc[{i}])"
        )
    fold = F.expr(
        f"aggregate(__a, {init}, (acc, x) -> array({', '.join(steps)}))"
    )
    g = g.withColumn("__s", fold)
    # build shallow -> deep so the DEEPEST reached level wraps outermost
    depth = F.lit(0)
    for i in range(K):
        depth = F.when(
            F.expr(f"__s[{i}] >= 0L"), F.lit(i + 1)
        ).otherwise(depth)
    return g.select(
        F.col(by), "n_events", depth.cast("long").alias("funnel_depth")
    )
