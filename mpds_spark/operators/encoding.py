"""Leakage-safe categorical encoders for training-set assembly.

Target encoding (replacing a categorical with a statistic of the label
conditioned on it) is the classic way to leak the label into a feature:
encoding a row with a mean that includes that row's own label is
train-time-only signal. The reference pipeline faces the same family of
hazards in its before/after-medication interleave (train rows must never
see their own outcome; cf. interleave pairing in
`dssl/dssFunctionLibrary.R:119-171` and the held-out scoring split in
`dssPerformanceEvaluation.R:49-58`); this module provides the two
standard leak-free constructions:

- **out-of-fold (OOF)**: rows are deterministically hashed into K folds;
  each row's encoding is computed from the other K-1 folds only. This is
  the batch/training-set shape — and the 100-TB shape, because the
  per-(category, fold) sufficient statistics are a tiny aggregate
  (|categories| x K rows) that is broadcast back; the fact table is
  touched by exactly one map-side-combinable aggregation and one
  broadcast join. No window ever partitions by the (skewed, low-
  cardinality) category column on the big table.
- **smoothing**: enc = (loo_sum + m * prior) / (loo_cnt + m), the
  standard empirical-Bayes shrinkage (Micci-Barreca 2001, SIGKDD
  Explorations). The prior is itself leave-fold-out (grand totals minus
  the row's fold), so a fold's labels never reach its own rows through
  the prior either. When a category is absent from the other folds
  (loo_cnt = 0) the formula degrades to the prior exactly — no special
  case.

Determinism: fold assignment is a pure function of row content
(md5-prefix hash, same idiom as `sampling.hash_split`); all sufficient
statistics are exact integer sums; the encoding performs the identical
float expression tree in any engine, so values are bit-reproducible
across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fold_assign", "target_encode_oof"]


def fold_assign(key_col, n_folds: int = 5, salt: str = "fold"):
    """Deterministic fold id in [0, n_folds) from md5 of the key column.

    Pure function of row content — stable under repartitioning, resume,
    and engine (DuckDB twin:
    ``CAST(('0x' || substr(md5('<salt>|' || CAST(key AS VARCHAR)), 1, 8))
    AS BIGINT) % n_folds``).
    """
    h = F.md5(F.concat(F.lit(salt + "|"), key_col.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(n_folds)
    ).cast("int")


def target_encode_oof(
    df: DataFrame,
    category: str,
    target: str,
    key: str,
    n_folds: int = 5,
    m: float = 10.0,
    out_col: str | None = None,
    fold_col: str = "fold",
) -> DataFrame:
    """Out-of-fold smoothed target encoding of `category` by `target`.

    Returns `df` plus `fold_col` (int) and `out_col` (double): the
    empirical-Bayes-smoothed mean of `target` over the OTHER folds'
    rows of the same category, shrunk toward the leave-fold-out global
    mean with pseudo-count `m`.

    Plan shape (the 100-TB contract): ONE hash exchange on the fact
    table (the (category, fold) partial-aggregate), window passes only
    on the |categories| x n_folds tiny frame, and a broadcast hash join
    back — the fact table is never shuffled on the skewed category key
    and never sorted.

    `target` is cast to long — pass an integer/boolean label (exact
    sums; floats would make the sums shuffle-order-dependent).
    """
    if out_col is None:
        out_col = f"te_{category}"
    e = df.withColumn(fold_col, fold_assign(F.col(key), n_folds))
    cf = e.groupBy(category, fold_col).agg(
        F.sum(F.col(target).cast("long")).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    # tiny frame: |categories| x n_folds rows — the unordered windows
    # below (incl. the single-partition grand total) are intentional and
    # bounded; they never touch the fact table.
    w_cat = Window.partitionBy(category)
    w_fold = Window.partitionBy(fold_col)
    w_all = Window.partitionBy()
    lo = cf.select(
        category,
        fold_col,
        (F.sum("__s").over(w_cat) - F.col("__s")).alias("__loo_s"),
        (F.sum("__c").over(w_cat) - F.col("__c")).alias("__loo_c"),
        (F.sum("__s").over(w_all) - F.sum("__s").over(w_fold)).alias("__g_s"),
        (F.sum("__c").over(w_all) - F.sum("__c").over(w_fold)).alias("__g_c"),
    )
    prior = F.col("__g_s").cast("double") / F.col("__g_c").cast("double")
    te = (F.col("__loo_s").cast("double") + F.lit(float(m)) * prior) / (
        F.col("__loo_c").cast("double") + F.lit(float(m))
    )
    return (
        e.join(F.broadcast(lo), [category, fold_col], "left")
        .withColumn(out_col, te)
        .drop("__loo_s", "__loo_c", "__g_s", "__g_c")
    )


def woe_encoding(
    df: DataFrame,
    category: str = "category",
    label: str = "label",
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding + per-category information-value
    terms (the credit-scoring categorical encoder; Siddiqi 2006):

        woe_i = ln( (pos_i + s) * neg_total / ((neg_i + s) * pos_total) )
        iv_i  = (pos_i/pos_total - neg_i/neg_total) * woe_i

    with additive smoothing s guarding empty cells. `label` must be a
    boolean column.

    Cross-engine determinism: cell counts are exact longs; the ln
    argument is a product/ratio of (count + s) doubles — identical
    arithmetic both engines (the integer-ratio-ln convention, smoothing
    aside); totals come from the same single aggregation via a window
    over the |categories|-sized frame, so there is no second scan.

    Shape at scale: ONE category-keyed aggregation; the totals window
    runs on the tiny aggregated frame (single-partition pass over
    |categories| rows). Returns (category, n_pos, n_neg, woe, iv_term).
    """
    s = float(smoothing)
    cells = df.groupBy(F.col(category).alias("category")).agg(
        F.sum(F.when(F.col(label), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col(label), 0).otherwise(1))
        .cast("long")
        .alias("n_neg"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cells = cells.withColumn(
        "__pt", F.sum("n_pos").over(w).cast("long")
    ).withColumn("__nt", F.sum("n_neg").over(w).cast("long"))
    woe = F.log(
        ((F.col("n_pos").cast("double") + F.lit(s)) * F.col("__nt").cast("double"))
        / ((F.col("n_neg").cast("double") + F.lit(s)) * F.col("__pt").cast("double"))
    )
    iv = (
        F.col("n_pos").cast("double") / F.col("__pt").cast("double")
        - F.col("n_neg").cast("double") / F.col("__nt").cast("double")
    )
    return cells.select(
        "category",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        (iv * woe).alias("iv_term"),
    )
