"""End-to-end mPDS scoring pipeline (notebook parity).

Re-creates mpds/DSSL_Training_and_Evaluation.ipynb cells 5-29 as one lazy
DataFrame pipeline over a design-matrix table
(entity_id, ts, features: array<double>):

1. interleave split (cell 5): before = even rows, after = odd (order-derived)
2. robust scale per feature position (cell 16, sklearn RobustScaler: fit on
   the given frame, (x - median)/IQR) — ONE aggregation pass via posexplode
   + exact percentile, applied JVM-side with zip_with against literal arrays
3. pair construction (cells 12+16): ordering pairs = (before, after) of the
   same visit; smoothness pairs = consecutive same-entity rows
4. dot-product scoring (cell 14: pairs.dot(weights)) + pair win-rate
   accuracy (mean(diff >= 0))
5. 0-100 mPDS rescale (cells 28-29: RobustScaler(15, 85), 50z+50, clamp)

The training step itself (R dssTrain nlm optimizer) is out of engine scope
(SURVEY.md §3.2); the pipeline produces its inputs and consumes its weight
vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mpds_spark.operators.battery import score_dot
from mpds_spark.operators.scale import rescale_scores
from mpds_spark.operators.windows import interleave_split


def fit_robust_scaler_array(
    df: DataFrame, col: str = "features", approx: bool = False,
    accuracy: int = 10000,
) -> tuple[list[float], list[float]]:
    """Per-position (median, IQR) of an array column — one explode + one agg.

    approx=True swaps exact `percentile` for the mergeable
    `approx_percentile` sketch: at 10^12 rows x 435 positions the exact
    variant buffers every value per position, the sketch keeps O(accuracy)
    per position and merges map-side."""
    fn = (
        f"approx_percentile(v, array(0.5, 0.25, 0.75), {accuracy})"
        if approx
        else "percentile(v, array(0.5, 0.25, 0.75))"
    )
    pos = df.select(F.posexplode(col).alias("pos", "v"))
    rows = (
        pos.groupBy("pos")
        .agg(F.expr(fn).alias("p"))
        .orderBy("pos")
        .collect()
    )
    med = [float(r["p"][0]) for r in rows]
    iqr = [
        float(r["p"][2] - r["p"][1]) if (r["p"][2] - r["p"][1]) else 1.0
        for r in rows
    ]
    return med, iqr


def apply_robust_scaler_array(
    df: DataFrame, med: list[float], iqr: list[float], col: str = "features"
) -> DataFrame:
    m = F.array(*[F.lit(v) for v in med])
    q = F.array(*[F.lit(v) for v in iqr])
    scaled = F.zip_with(
        F.zip_with(F.col(col), m, lambda x, mu: x - mu),
        q,
        lambda x, s: x / s,
    )
    return df.withColumn(col, scaled)


def pair_feature_diffs(
    df: DataFrame,
    kind: str = "ordering",
    entity: str = "entity_id",
    ts: str = "ts",
    col: str = "features",
) -> DataFrame:
    """Pair rows and emit later-minus-earlier feature-array diffs.

    ordering: (before, after) interleaved visit pairs — diff = after - before
    smoothness: consecutive same-entity rows — diff = next - current
    """
    w = Window.partitionBy(entity).orderBy(ts)
    d = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__next", F.lead(col).over(w)
    )
    if kind == "ordering":
        d = d.filter((F.col("__rn") % 2 == 1) & F.col("__next").isNotNull())
    elif kind == "smoothness":
        d = d.filter(F.col("__next").isNotNull())
    else:
        raise ValueError(kind)
    return d.withColumn(
        "pair_diff", F.zip_with("__next", col, lambda a, b: a - b)
    ).drop("__rn", "__next")


def score_pairs(
    pairs: DataFrame, weights: list[float], diff_col: str = "pair_diff"
) -> tuple[DataFrame, DataFrame]:
    """Dot-product pair scores + win-rate accuracy (cell 14 get_accuracy)."""
    scored = score_dot(pairs, diff_col, weights, out_col="pair_score")
    acc = scored.agg(
        F.avg((F.col("pair_score") >= 0).cast("double")).alias("accuracy"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return scored, acc


def mpds_pipeline(
    design: DataFrame,
    weights: list[float],
    entity: str = "entity_id",
    ts: str = "ts",
    col: str = "features",
) -> dict:
    """Full pipeline: split, fit+apply scaler, pairs, scores, 0-100 mPDS.

    Returns dict of lazy DataFrames + fitted params (nothing collected except
    the tiny scaler vectors).
    """
    split = interleave_split(design, entity=entity, ts=ts)
    med, iqr = fit_robust_scaler_array(split, col)
    scaled = apply_robust_scaler_array(split, med, iqr, col)

    ordering = pair_feature_diffs(scaled, "ordering", entity, ts, col)
    smoothness = pair_feature_diffs(scaled, "smoothness", entity, ts, col)
    ord_scored, ord_acc = score_pairs(ordering, weights)
    smo_scored, _ = score_pairs(smoothness, weights)

    row_scores = score_dot(scaled, col, weights, out_col="score")
    mpds, rescale_params = rescale_scores(row_scores, score="score")
    return {
        "scaled": scaled,
        "ordering_pairs": ord_scored,
        "smoothness_pairs": smo_scored,
        "ordering_accuracy": ord_acc,
        "scored": mpds,
        "scaler": (med, iqr),
        "rescale_params": rescale_params,
    }
