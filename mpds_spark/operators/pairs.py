"""Pair-generation operators and pairwise diffs.

The reference materializes pair tables as row-index relations
(dssFunctionLibrary.R:16-19 OrderPairs(onIdx, offIdx)); Spark has no stable
row ids, so pairs are key-based:

- smoothness_pairs ← dssFunctionLibrary.R:174-205 + NB cell 16: each row
  paired with the NEXT row of the same entity → pure F.lead, no join.
- ordering_pairs ← NB cells 5+12: the interleaved (before, after) visit
  pairs — even row paired with the following odd row per entity.
- pair_diff ← dssFunctionLibrary.R:371-398 (calculateDiffMatrix/Vec):
  given a pair table (on_key, off_key) and a keyed data table, emit
  data[on] - data[off] per feature — two equi-joins + zip_with arithmetic.
- sampled_pairs ← dssFunctionLibrary.R:38-52 (subsampleSetOfPossiblePairs):
  seeded sampled cross join capped at n_pairs, deduped; the dropped-count
  is observable (no silent caps).
- random_ordered_pairs ← mimicUsefulFunction.R:162-193: sampled pairs
  oriented by a rank column (higher rank first), deduped, capped.

Scale: lead-based pairs are window-only. pair_diff joins are sort-merge on
the key (or broadcast when one side is small); the arrays stay JVM-side via
zip_with (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mpds_spark.functions.timeutil import epoch_seconds


def smoothness_pairs(
    df: DataFrame,
    cols: list[str],
    entity: str = "entity_id",
    ts: str = "ts",
    key: str | None = None,
) -> DataFrame:
    """Consecutive same-entity row pairs: for each row (off) with a successor
    (on), emit on-off deltas of `cols` plus diff_ts = ts_on - ts_off.

    Parity: dssGenerateSmoothnessPairs (onIdx = offIdx + 1, same-entity
    guard) — the reference's diff convention is on - off = later - earlier.
    """
    w = Window.partitionBy(entity).orderBy(ts)
    out = df
    t = epoch_seconds(df, ts)
    for c in cols:
        out = out.withColumn(f"{c}_pair_diff", F.lead(c).over(w) - F.col(c))
    out = out.withColumn("pair_diff_ts", F.lead(t).over(w) - t)
    if key:
        out = out.withColumn("on_" + key, F.lead(key).over(w))
    return out.filter(F.col("pair_diff_ts").isNotNull())


def ordering_pairs(
    df: DataFrame,
    cols: list[str],
    entity: str = "entity_id",
    ts: str = "ts",
) -> DataFrame:
    """Interleaved before/after pairs: per entity, row 2k (before) is paired
    with row 2k+1 (after); emit after-before deltas.

    Parity: NB cell 5 (iloc[::2]/[1::2]) + cell 12 OrderPairs — order-derived
    via row_number, never physical position.
    """
    w = Window.partitionBy(entity).orderBy(ts)
    rn = F.row_number().over(w)
    out = df.withColumn("__rn", rn)
    for c in cols:
        out = out.withColumn(f"{c}_pair_diff", F.lead(c).over(w) - F.col(c))
    t = epoch_seconds(df, ts)
    out = out.withColumn("pair_diff_ts", F.lead(t).over(w) - t)
    # keep only the even (before) rows that have an after partner
    return out.filter(
        (F.col("__rn") % 2 == 1) & F.col("pair_diff_ts").isNotNull()
    ).drop("__rn")


def pair_diff(
    pairs: DataFrame,
    data: DataFrame,
    key: str,
    cols: list[str],
    on_key: str = "on_key",
    off_key: str = "off_key",
    array_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize data[on] - data[off] for a pair table.

    Scalar `cols` are differenced directly; `array_cols` (ArrayType feature
    vectors) via zip_with(on, off, (a, b) -> a - b) — JVM-side, no Python.
    """
    array_cols = array_cols or []
    on = data.select(
        F.col(key).alias(on_key),
        *[F.col(c).alias(f"__on_{c}") for c in cols + array_cols],
    )
    off = data.select(
        F.col(key).alias(off_key),
        *[F.col(c).alias(f"__off_{c}") for c in cols + array_cols],
    )
    j = pairs.join(on, on_key, "inner").join(off, off_key, "inner")
    for c in cols:
        j = j.withColumn(f"{c}_diff", F.col(f"__on_{c}") - F.col(f"__off_{c}"))
    for c in array_cols:
        j = j.withColumn(
            f"{c}_diff",
            F.zip_with(f"__on_{c}", f"__off_{c}", lambda a, b: a - b),
        )
    drop = [f"__on_{c}" for c in cols + array_cols] + [
        f"__off_{c}" for c in cols + array_cols
    ]
    return j.drop(*drop)


def sampled_pairs(
    left_keys: DataFrame,
    right_keys: DataFrame,
    n_pairs: int,
    key: str = "key",
    seed: int = 42,
    max_exact: int = 1_000_000,
) -> DataFrame:
    """Candidate pairs (on_key, off_key): exact cross join when |A×B| is
    small, else seeded oversample (10x) + dedupe + limit, mirroring
    subsampleSetOfPossiblePairs (dssFunctionLibrary.R:38-52)."""
    nl = left_keys.count()
    nr = right_keys.count()
    lk = left_keys.select(F.col(key).alias("on_key"))
    rk = right_keys.select(F.col(key).alias("off_key"))
    if nl * nr <= max_exact:
        allp = lk.crossJoin(rk)
        if nl * nr <= n_pairs:
            return allp
        return (
            allp.withColumn("__r", F.rand(seed))
            .orderBy("__r")
            .limit(n_pairs)
            .drop("__r")
        )
    frac_each = min(1.0, (10.0 * n_pairs) ** 0.5 / min(nl, nr))
    ls = lk.sample(fraction=frac_each, seed=seed)
    rs = rk.sample(fraction=frac_each, seed=seed + 1)
    return (
        ls.crossJoin(rs)
        .dropDuplicates(["on_key", "off_key"])
        .withColumn("__r", F.rand(seed + 2))
        .orderBy("__r")
        .limit(n_pairs)
        .drop("__r")
    )


def cross_stage_pairs(
    df: DataFrame,
    key: str,
    stage: str = "stage",
    entity: str = "entity_id",
    ts: str = "ts",
    min_ht_gap: float = 0.0,
    within_entity: bool = True,
) -> DataFrame:
    """Theta-join pairs with stage(on) > stage(off) and |ts gap| >= min_ht_gap.

    Parity: generateBalancedPairs (dssFunctionLibrary.R:57-104) — the high-
    stage row is `on`, low-stage `off`.
    """
    a = df.select(
        F.col(key).alias("on_key"),
        F.col(entity).alias("__e1"),
        epoch_seconds(df, ts).alias("__t1"),
        F.col(stage).alias("__s1"),
    )
    b = df.select(
        F.col(key).alias("off_key"),
        F.col(entity).alias("__e2"),
        epoch_seconds(df, ts).alias("__t2"),
        F.col(stage).alias("__s2"),
    )
    cond = (F.col("__s1") > F.col("__s2")) & (
        F.abs(F.col("__t1") - F.col("__t2")) >= F.lit(float(min_ht_gap))
    )
    if within_entity:
        cond = cond & (F.col("__e1") == F.col("__e2"))
    return (
        a.join(b, cond, "inner")
        .select("on_key", "off_key", "__s1", "__s2")
        .withColumnRenamed("__s1", "on_stage")
        .withColumnRenamed("__s2", "off_stage")
    )


def random_ordered_pairs(
    df: DataFrame,
    key: str,
    rank: str,
    n_pairs: int,
    seed: int = 42,
) -> DataFrame:
    """Seeded random rank-ordered pairs (mimicUsefulFunction.R:162-193
    createRandomPairsOrderedByRank): oversample 2x candidate pairs with
    replacement, drop same-key / equal-rank pairs, orient so the higher
    rank is `on` (vector_swap, :153-158), dedupe, cap at n_pairs.
    """
    keyed = df.select(F.col(key).alias("k"), F.col(rank).alias("r"))
    n = keyed.count()
    frac = min(1.0, 4.0 * n_pairs / max(n * n, 1)) ** 0.5
    a = keyed.sample(withReplacement=True, fraction=max(frac * n, 1.0) / n, seed=seed)
    a = a.withColumn("__i", F.monotonically_increasing_id())
    b = keyed.sample(
        withReplacement=True, fraction=max(frac * n, 1.0) / n, seed=seed + 1
    ).withColumn("__i", F.monotonically_increasing_id())
    cand = (
        a.alias("x")
        .join(b.alias("y"), "__i")
        .select(
            F.col("x.k").alias("k1"),
            F.col("x.r").alias("r1"),
            F.col("y.k").alias("k2"),
            F.col("y.r").alias("r2"),
        )
        .filter((F.col("k1") != F.col("k2")) & (F.col("r1") != F.col("r2")))
    )
    oriented = cand.select(
        F.when(F.col("r1") >= F.col("r2"), F.col("k1"))
        .otherwise(F.col("k2"))
        .alias("on_key"),
        F.when(F.col("r1") >= F.col("r2"), F.col("k2"))
        .otherwise(F.col("k1"))
        .alias("off_key"),
    )
    return oriented.dropDuplicates(["on_key", "off_key"]).limit(n_pairs)
