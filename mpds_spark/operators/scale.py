"""Scaling / rescoring operators.

Parity:
- robust_scale ← NB cell 16 (sklearn RobustScaler: (x - median) / IQR per
  column, fit on train only). Exact percentiles via Spark's `percentile`
  (matches numpy/sklearn 'linear' interpolation).
- minmax / standard scale ← mimicUsefulFunction.R:122-149
  (calculateCenteringAndRescalingDataForMatrix + Apply…): center by mean,
  scale to the [minVal, maxVal] envelope.
- rescale_scores ← NB cells 28-29: RobustScaler(quantile_range=(15, 85)) on
  the score column, then 50*z + 50, clamped to [0, 100] — the 0-100 mPDS.

Design: fit = ONE aggregation pass producing a tiny plan-embedded literal
map (collected on the driver — it is O(#cols), not O(rows)); transform =
pure column arithmetic (codegen). The fit/transform split keeps the
train-only-fit discipline (no leakage from eval rows into the scaler).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_robust_scaler(
    df: DataFrame,
    cols: list[str],
    q_low: float = 0.25,
    q_high: float = 0.75,
    approx: bool = False,
    accuracy: int = 10000,
) -> dict[str, tuple[float, float]]:
    """One agg pass → {col: (median, iqr)}.

    approx=False (default): exact `percentile` — sklearn parity, used by
    every oracle query; single-reduce sort per column, fine to ~10^8 rows.
    approx=True: `approx_percentile` (Greenwald-Khanna sketch, mergeable
    partials) — the 100-TB fit path for wide (400+ col) fits, where the
    exact variant's per-column sort buffers don't fit; error is bounded by
    1/accuracy of the rank."""
    fn = "approx_percentile" if approx else "percentile"
    acc = f", {accuracy}" if approx else ""
    aggs = []
    for c in cols:
        aggs.append(
            F.expr(
                f"{fn}(`{c}`, array(0.5, {q_low}, {q_high}){acc})"
            ).alias(f"__p_{c}")
        )
    row = df.agg(*aggs).collect()[0]
    params = {}
    for c in cols:
        med, lo, hi = row[f"__p_{c}"]
        iqr = hi - lo
        params[c] = (float(med), float(iqr) if iqr else 1.0)
    return params


def apply_robust_scaler(
    df: DataFrame, params: dict[str, tuple[float, float]], suffix: str = ""
) -> DataFrame:
    out = df
    for c, (med, iqr) in params.items():
        out = out.withColumn(c + suffix, (F.col(c) - F.lit(med)) / F.lit(iqr))
    return out


def robust_scale(
    train: DataFrame, cols: list[str], apply_to: DataFrame | None = None
) -> tuple[DataFrame, DataFrame | None, dict]:
    """Fit on train, transform train (and optionally a held-out frame)."""
    params = fit_robust_scaler(train, cols)
    t = apply_robust_scaler(train, params)
    a = apply_robust_scaler(apply_to, params) if apply_to is not None else None
    return t, a, params


def rescale_scores(
    df: DataFrame,
    score: str = "score",
    out_col: str = "mpds",
    q_low: float = 0.15,
    q_high: float = 0.85,
    params: dict | None = None,
) -> tuple[DataFrame, dict]:
    """0-100 mPDS rescale (NB cells 28-29): robust-scale the score with the
    (q_low, q_high) quantile range, then 50*z + 50 clamped to [0, 100]."""
    if params is None:
        params = fit_robust_scaler(df, [score], q_low, q_high)
    med, iqr = params[score]
    z = (F.col(score) - F.lit(med)) / F.lit(iqr)
    scaled = F.lit(50.0) * z + F.lit(50.0)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(100.0))
    return df.withColumn(out_col, clamped), params


def fit_center_rescale(
    df: DataFrame, cols: list[str]
) -> dict[str, tuple[float, float, float]]:
    """Parity: calculateCenteringAndRescalingDataForMatrix
    (mimicUsefulFunction.R:122-133): per column (mean, min, max)."""
    aggs = []
    for c in cols:
        aggs += [
            F.avg(c).alias(f"__m_{c}"),
            F.min(c).alias(f"__lo_{c}"),
            F.max(c).alias(f"__hi_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    return {
        c: (float(row[f"__m_{c}"]), float(row[f"__lo_{c}"]), float(row[f"__hi_{c}"]))
        for c in cols
    }


def apply_center_rescale(
    df: DataFrame, params: dict[str, tuple[float, float, float]]
) -> DataFrame:
    """(x - mean) / (max - min), guarding zero spread (parity :136-149)."""
    out = df
    for c, (mean, lo, hi) in params.items():
        spread = (hi - lo) or 1.0
        out = out.withColumn(c, (F.col(c) - F.lit(mean)) / F.lit(spread))
    return out
