"""Per-entity categorical-profile divergence vs the corpus mix.

The behavioral-fingerprint feature: how far an entity's event-type
distribution sits from the global one — bots and broken integrations
light up long before any single-event rule fires. Statistically it is
the same discrete-distribution machinery as functions/mlstats.py
(reference parity: discrete entropy/MI transcriptions), applied
entity-vs-corpus with the engine's exactness conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def behavior_divergence(
    df: DataFrame,
    state: str = "event_type",
    by: str = "entity_id",
) -> DataFrame:
    """KL(entity || corpus) in nats and the total-variation distance
    between each entity's categorical distribution and the corpus-wide
    one, plus the entity's modal category (ties break to the
    lexicographically greatest category, mirrored in the oracle).

    Cross-engine determinism: all counts are exact longs. KL folds
    SEQUENTIALLY over the category-sorted per-entity cell array with
    ln((c*N)/(n*g)) — ratios of exact integers, so both engines hand ln
    identical doubles; KL sums over the entity's support (c > 0), which
    is the full support of q-absolutely-continuous p, so it is the true
    KL. TV rewrites as [sum_present |c*N - n*g| + n*(N - g_present)]
    / (2*n*N): the present-category sum is an exact DECIMAL(38,0)/
    hugeint, the absent-category mass |0 - n*g| totals n*(N - g_present)
    exactly, one double division at the end.

    Shape at scale: the (entity, category) cell count is persisted once
    (scratch-tracked) so the |alphabet|-row category marginal and its
    1-row total derive from it without re-scanning the source; the
    marginal broadcasts back onto the cells and one entity agg finishes.
    Skew-immune — a hot entity collapses at the first partial agg.

    Returns (by, n_events, n_types, top_type, kl_global, tv_global)."""
    from mpds_spark.operators.util import scratch_persist

    cells = scratch_persist(
        df.groupBy(by, F.col(state).cast("string").alias("__s")).agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )
    )
    gl = cells.groupBy("__s").agg(F.sum("__c").cast("long").alias("__g"))
    tot = gl.agg(F.sum("__g").cast("long").alias("__n_total"))
    gl = gl.crossJoin(F.broadcast(tot))
    j = cells.join(F.broadcast(gl), "__s")
    dec = "decimal(38,0)"
    per_e = j.groupBy(by).agg(
        F.sum("__c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.max("__n_total").alias("__N"),
        F.sum("__g").cast("long").alias("__g_present"),
        F.max(
            F.struct(F.col("__c").alias("c"), F.col("__s").alias("s"))
        ).alias("__top"),
        F.array_sort(
            F.collect_list(F.struct("__s", "__c", "__g"))
        ).alias("__cells"),
    )
    n = F.col("n_events").cast("double")
    N = F.col("__N").cast("double")
    n_dec = F.col("n_events").cast(dec)
    N_dec = F.col("__N").cast(dec)
    kl = F.aggregate(
        "__cells",
        F.lit(0.0),
        lambda acc, s: acc
        + (s["__c"].cast("double") / n)
        * F.log(
            (s["__c"].cast(dec) * N_dec).cast("double")
            / (n_dec * s["__g"].cast(dec)).cast("double")
        ),
    )
    tv_present = F.aggregate(
        "__cells",
        F.lit(0).cast(dec),
        lambda acc, s: acc
        + F.abs(s["__c"].cast(dec) * N_dec - n_dec * s["__g"].cast(dec)),
    )
    # categories absent from the entity contribute |0 - n*g| = n*g each:
    # n * (N - g_present) in total, exactly
    tv_absent = n_dec * (N_dec - F.col("__g_present").cast(dec))
    tv = (tv_present + tv_absent).cast("double") / (2.0 * n * N)
    return per_e.select(
        F.col(by),
        "n_events",
        "n_types",
        F.col("__top.s").alias("top_type"),
        kl.alias("kl_global"),
        tv.alias("tv_global"),
    )
