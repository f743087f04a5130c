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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_robust_scaler(
    df: DataFrame,
    cols: list[str],
    q_low: float = 0.25,
    q_high: float = 0.75,
    approx: bool = False,
    accuracy: int = 100,
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


def exact_quantiles_bracketed(
    df: DataFrame,
    cols: list[str],
    p: float = 0.5,
    guard: float = 0.05,
    accuracy: int = 100,
) -> dict[str, float]:
    """EXACT linear-interpolation quantile (Spark `percentile` / SQL
    quantile_cont semantics) per column, computed scale-correctly.

    Spark's exact `percentile` aggregate materializes a value->count map
    per partition and merges the maps on one reducer — fine for
    low-cardinality columns, pathological for high-cardinality ones (600k
    distinct prices take ~3 s at sf0.1; at 10^12 rows the merge is
    unrunnable). This is the standard bracketed-selection algorithm:

      1. ONE agg over all columns: non-null count + approx_percentile
         bracket [p-guard, p+guard] (t-digest; rank error n/accuracy —
         accuracy=100 keeps the per-row insert cheap while the error,
         0.01n, stays 5x inside the guard*n = 0.05n margin).
      2. ONE agg over all columns: exact #values strictly below each
         bracket's lo (turns in-bracket ranks into global ranks).
      3. Sort ONLY the in-bracket slices (~2*guard*n rows per column,
         all columns stacked into one (col, value) frame, one window) and
         read off the two order statistics quantile_cont interpolates at
         pos = (n-1)*p.

    If a bracket misses the needed ranks (data skew beyond the t-digest
    bound — cannot happen while guard*n > n/accuracy, but guarded anyway)
    that column falls back to the exact aggregate.
    """
    from pyspark.sql import Window

    d = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    lo_p, hi_p = max(p - guard, 0.0), min(p + guard, 1.0)
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.expr(
                f"approx_percentile({c}, array({lo_p}, {hi_p}), {accuracy})"
            ).alias(f"__b_{c}"),
        ]
    first = d.agg(*aggs).collect()[0]
    out: dict[str, float] = {}
    ranks: dict[str, tuple[int, int, float]] = {}
    brackets: dict[str, tuple[float, float]] = {}
    for c in cols:
        n = first[f"__n_{c}"]
        if n == 0:
            out[c] = float("nan")
            continue
        lo, hi = first[f"__b_{c}"]
        pos = (n - 1) * p
        # 1-based global ranks of the two order statistics to interpolate
        ranks[c] = (int(pos) + 1, min(int(pos) + 2, n), pos - int(pos))
        brackets[c] = (float(lo), float(hi))
    if not ranks:
        return out
    below = d.agg(
        *[
            F.sum((F.col(c) < F.lit(brackets[c][0])).cast("long")).alias(c)
            for c in ranks
        ]
    ).collect()[0]
    want: dict[str, set] = {}
    for c in ranks:
        k_lo, k_hi, _ = ranks[c]
        nb = below[c] or 0
        want[c] = {k_lo - nb, k_hi - nb}
    # ONE scan for every column's in-bracket slice: explode each row into
    # (col, val) structs, keep only in-bracket values (a union of per-column
    # filtered scans would re-read the table once per column)
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("__col"), F.col(c).alias("__val"))
            for c in ranks
        ]
    )
    in_bracket = None
    for c, (lo, hi) in brackets.items():
        cnd = (F.col("__col") == c) & F.col("__val").between(lo, hi)
        in_bracket = cnd if in_bracket is None else (in_bracket | cnd)
    stacked = (
        d.select(F.explode(pairs).alias("__e"))
        .select("__e.__col", "__e.__val")
        .filter(in_bracket)
    )
    w = Window.partitionBy("__col").orderBy("__val")
    conds = None
    for c, ks in want.items():
        cnd = (F.col("__col") == c) & F.col("__r").isin(*ks)
        conds = cnd if conds is None else (conds | cnd)
    rows = (
        stacked.withColumn("__r", F.row_number().over(w))
        .filter(conds)
        .collect()
    )
    vals = {(r["__col"], r["__r"]): r["__val"] for r in rows}
    for c, (k_lo, k_hi, frac) in ranks.items():
        nb = below[c] or 0
        a, b = vals.get((c, k_lo - nb)), vals.get((c, k_hi - nb))
        if a is None or b is None:
            out[c] = float(
                d.agg(F.expr(f"percentile({c}, {p})")).collect()[0][0]
            )
            continue
        # lower*(1-f) + higher*f: the EXACT float formula both Spark's
        # Percentile and DuckDB's quantile_cont use — lo + (hi-lo)*f
        # differs by 1 ulp on cases like (26965.01, 26965.05, f=0.25)
        out[c] = float(a * (1.0 - frac) + b * frac)
    return out


def exact_grouped_quantiles_multi(
    df: DataFrame,
    key: str,
    col: str,
    ps: list,
    guard: float = 0.05,
    accuracy: int = 100,
) -> DataFrame:
    """K exact per-group quantiles in ONE pass of the three-stage
    bracketed-selection plan (the single-p exact_grouped_quantiles
    delegates here): the bracket aggregation fetches all 2K approximate
    bounds at once, the below-bracket counts are K conditional sums in one
    grouped agg, and the in-bracket slices of every p are unioned with a
    p-index tag so ONE (key, p)-partitioned rank window serves every
    quantile. Row duplication is only across overlapping brackets
    (~2*guard*n_k per p). Returns long format: (key, p, q_<col>).
    """
    from pyspark.sql import Window

    ps = [float(x) for x in ps]
    K = len(ps)
    d = df.select(F.col(key).alias("__k"), F.col(col).cast("double").alias("__x"))
    bounds = []
    for x in ps:
        bounds += [max(x - guard, 0.0), min(x + guard, 1.0)]
    small = F.col("__n") < 100
    br = d.groupBy("__k").agg(
        F.count("__x").alias("__n"),
        F.expr(
            f"approx_percentile(__x, array({', '.join(map(str, bounds))}), {accuracy})"
        ).alias("__b"),
        F.min("__x").alias("__mn"),
        F.max("__x").alias("__mx"),
    )
    cols = ["__k", "__n"]
    for i, x in enumerate(ps):
        cols += [
            F.when(small, F.col("__mn"))
            .otherwise(F.element_at("__b", 2 * i + 1))
            .alias(f"__lo{i}"),
            F.when(small, F.col("__mx"))
            .otherwise(F.element_at("__b", 2 * i + 2))
            .alias(f"__hi{i}"),
            F.floor((F.col("__n") - 1) * F.lit(x)).alias(f"__ipos{i}"),
            (
                (F.col("__n") - 1) * F.lit(x)
                - F.floor((F.col("__n") - 1) * F.lit(x))
            ).alias(f"__frac{i}"),
        ]
    br = br.select(*cols)
    joined = d.join(F.broadcast(br), "__k")
    below = joined.groupBy("__k").agg(
        *[
            F.sum(
                F.when(F.col("__x") < F.col(f"__lo{i}"), 1).otherwise(0)
            ).alias(f"__nb{i}")
            for i in range(K)
        ]
    )
    ranks = br.join(below, "__k", "left")
    # union the per-p in-bracket slices with a p-index tag (posexplode of
    # the membership array, filtered) -> one (key, p)-partitioned window
    member = F.array(
        *[
            F.when(
                F.col("__x").between(F.col(f"__lo{i}"), F.col(f"__hi{i}")),
                F.lit(1),
            ).otherwise(F.lit(0))
            for i in range(K)
        ]
    )
    tagged = (
        joined.select("__k", "__x", F.posexplode(member).alias("__p", "__m"))
        .filter(F.col("__m") == 1)
        .drop("__m")
    )
    w = Window.partitionBy("__k", "__p").orderBy("__x")
    sliced = tagged.withColumn("__r", F.row_number().over(w))
    # ONE explode over an array of per-p structs — a per-p union of
    # selects would re-plan (and re-execute) the ranks subtree (the br
    # and below aggregations) K times; the same melt fix as validate()
    need_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("__p"),
                F.lit(x).alias("p"),
                F.col(f"__frac{i}").alias("__frac"),
                (
                    F.col(f"__ipos{i}")
                    + 1
                    - F.coalesce(F.col(f"__nb{i}"), F.lit(0))
                ).alias("__r_lo"),
                (
                    F.least(F.col(f"__ipos{i}") + 2, F.col("__n"))
                    - F.coalesce(F.col(f"__nb{i}"), F.lit(0))
                ).alias("__r_hi"),
            )
            for i, x in enumerate(ps)
        ]
    )
    need = ranks.select("__k", F.explode(need_structs).alias("__s")).select(
        "__k",
        F.col("__s.__p").alias("__p"),
        F.col("__s.p").alias("p"),
        F.col("__s.__frac").alias("__frac"),
        F.col("__s.__r_lo").alias("__r_lo"),
        F.col("__s.__r_hi").alias("__r_hi"),
    )
    got = (
        sliced.join(F.broadcast(need), ["__k", "__p"])
        .filter(
            (F.col("__r") == F.col("__r_lo")) | (F.col("__r") == F.col("__r_hi"))
        )
        .groupBy("__k", "__p", "p", "__frac")
        .agg(
            F.min(F.when(F.col("__r") == F.col("__r_lo"), F.col("__x"))).alias(
                "__v_lo"
            ),
            F.min(F.when(F.col("__r") == F.col("__r_hi"), F.col("__x"))).alias(
                "__v_hi"
            ),
        )
    )
    return got.select(
        F.col("__k").alias(key),
        "p",
        (
            F.col("__v_lo") * (F.lit(1.0) - F.col("__frac"))
            + F.col("__v_hi") * F.col("__frac")
        ).alias(f"q_{col}"),
    )


def exact_grouped_quantiles(
    df: DataFrame,
    key: str,
    col: str,
    p: float = 0.5,
    guard: float = 0.05,
    accuracy: int = 100,
) -> DataFrame:
    """EXACT per-group linear-interpolation quantile (quantile_cont
    semantics), fully distributed — the grouped twin of
    exact_quantiles_bracketed.

    Plan: (1) one groupBy agg for per-key non-null count + approx bracket
    [p-guard, p+guard]; (2) broadcast the tiny per-key bracket frame back
    onto the data for one pass computing per-key below-bracket counts;
    (3) a window over ONLY the in-bracket slice of each key (~2*guard*n_k
    rows) reads off the two order statistics at pos = (n_k - 1) * p, and
    pure column math interpolates. No value->count map ever concentrates
    on a reducer (Spark's exact `percentile` does), and nothing lands on
    the driver — group count and group size are both unbounded.

    Rank-coverage guarantee: t-digest rank error n_k/accuracy <= guard*n_k
    whenever accuracy > 1/guard (100 >> 20); unlike the global variant no
    per-column fallback is needed because the guarantee is per-group by
    the same inequality. Returns (key, q_<col>) one row per group with a
    non-null value; empty groups simply don't appear (same as GROUP BY).
    """
    from pyspark.sql import Window

    d = df.select(F.col(key).alias("__k"), F.col(col).cast("double").alias("__x"))
    lo_p, hi_p = max(p - guard, 0.0), min(p + guard, 1.0)
    # rank-coverage: the t-digest bracket guarantees the two interpolation
    # ranks only while guard*n - n/accuracy >= 2 (n >= 50 at 0.05/100);
    # below n=100 the bracket is simply [min, max] — the whole group IS
    # the in-bracket slice, and a 100-row sort per tiny group is free
    small = F.col("__n") < 100
    br = d.groupBy("__k").agg(
        F.count("__x").alias("__n"),
        F.expr(
            f"approx_percentile(__x, array({lo_p}, {hi_p}), {accuracy})"
        ).alias("__b"),
        F.min("__x").alias("__mn"),
        F.max("__x").alias("__mx"),
    ).select(
        "__k",
        "__n",
        F.when(small, F.col("__mn"))
        .otherwise(F.element_at("__b", 1))
        .alias("__lo"),
        F.when(small, F.col("__mx"))
        .otherwise(F.element_at("__b", 2))
        .alias("__hi"),
        F.floor((F.col("__n") - 1) * F.lit(p)).alias("__ipos"),
        ((F.col("__n") - 1) * F.lit(p) - F.floor((F.col("__n") - 1) * F.lit(p))).alias(
            "__frac"
        ),
    )
    joined = d.join(F.broadcast(br), "__k")
    below = (
        joined.filter(F.col("__x") < F.col("__lo"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__nb"))
    )
    ranks = br.join(below, "__k", "left").select(
        "__k",
        "__ipos",
        "__frac",
        "__n",
        F.coalesce("__nb", F.lit(0)).alias("__nb"),
    )
    w = Window.partitionBy("__k").orderBy("__x")
    slice_ = (
        joined.filter(F.col("__x").between(F.col("__lo"), F.col("__hi")))
        .select("__k", "__x")
        .withColumn("__r", F.row_number().over(w))
    )
    # global rank of the two order stats, rebased into the slice
    need = ranks.select(
        "__k",
        "__frac",
        (F.col("__ipos") + 1 - F.col("__nb")).alias("__r_lo"),
        (
            F.least(F.col("__ipos") + 2, F.col("__n")) - F.col("__nb")
        ).alias("__r_hi"),
    )
    got = (
        slice_.join(F.broadcast(need), "__k")
        .filter(
            (F.col("__r") == F.col("__r_lo")) | (F.col("__r") == F.col("__r_hi"))
        )
        .groupBy("__k", "__frac")
        .agg(
            F.min(F.when(F.col("__r") == F.col("__r_lo"), F.col("__x"))).alias(
                "__v_lo"
            ),
            F.min(F.when(F.col("__r") == F.col("__r_hi"), F.col("__x"))).alias(
                "__v_hi"
            ),
        )
    )
    return got.select(
        F.col("__k").alias(key),
        # lower*(1-f) + higher*f: the exact float formula of both Spark's
        # Percentile and DuckDB's quantile_cont (1-ulp different from
        # lo + (hi-lo)*f, which breaks value-hash parity)
        (
            F.col("__v_lo") * (F.lit(1.0) - F.col("__frac"))
            + F.col("__v_hi") * F.col("__frac")
        ).alias(f"q_{col}"),
    )


def grouped_matlab_moments(
    df: DataFrame, group: str, col: str
) -> DataFrame:
    """Distributed MATLAB-convention moment battery per group — the
    DataFrame twin of functions/mlstats.py's numpy kernels (prctile
    midpoint grid mlstats.py:24, std n-1 :50, biased skew :56 / kurt :66,
    mode smallest-tie :44), expressed as two grouped aggregations plus
    one rank window so group count AND group size are unbounded:

    - pass 1: per-group n + mean;
    - pass 2 (centered): avg((x-mu)^k) for k=2..4 — no raw-power
      expansion, so no catastrophic cancellation at large |x|;
    - prctile p in {25, 50, 75}: MATLAB's midpoint-anchored grid
      q_r=(r-0.5)/n. t=clamp(p*n+0.5, 1, n), r=floor(t), f=t-r and the
      interpolated value x_r*(1-f) + x_{r+1}*f is read off the rank
      window with a conditional sum — no per-group sort collection
      (p50 on this grid IS MATLAB median for even and odd n);
    - mode: per-(group, value) count, argmax by (count desc, value asc).

    Returns one row per group: (group, n, mean, std, skew, kurt, p25,
    median, p75, mode).
    """
    d = df.select(
        F.col(group), F.col(col).cast("double").alias("x")
    ).filter(F.col("x").isNotNull())
    base = d.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"), F.avg("x").alias("mu")
    )
    c = d.join(base, group).withColumn(
        "rn", F.row_number().over(Window.partitionBy(group).orderBy("x"))
    )

    def pct(p: float, name: str):
        t = F.least(
            F.greatest(F.lit(p) * F.col("n") + F.lit(0.5), F.lit(1.0)),
            F.col("n").cast("double"),
        )
        r = F.floor(t)
        f = t - r
        return F.sum(
            F.when(F.col("rn") == r, F.col("x") * (F.lit(1.0) - f))
            .when(F.col("rn") == r + 1, F.col("x") * f)
            .otherwise(F.lit(0.0))
        ).alias(name)

    dx = F.col("x") - F.col("mu")
    mom = c.groupBy(group).agg(
        F.first("n").alias("n"),
        F.first("mu").alias("mean"),
        F.avg(dx * dx).alias("__m2"),
        F.avg(dx * dx * dx).alias("__m3"),
        F.avg(dx * dx * dx * dx).alias("__m4"),
        pct(0.25, "p25"),
        pct(0.50, "median"),
        pct(0.75, "p75"),
    )
    mode = (
        d.groupBy(group, "x")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(group).orderBy(
                    F.col("__c").desc(), F.col("x")
                )
            ),
        )
        .filter(F.col("__r") == 1)
        .select(F.col(group), F.col("x").alias("mode"))
    )
    m2, m3, m4, n = F.col("__m2"), F.col("__m3"), F.col("__m4"), F.col("n")
    return (
        mom.join(mode, group)
        .select(
            F.col(group),
            "n",
            "mean",
            F.when(
                n > 1, F.sqrt(m2 * n / (n - F.lit(1)))
            ).otherwise(F.lit(0.0)).alias("std"),
            F.when(m2 > 0, m3 / F.pow(m2, 1.5)).alias("skew"),
            F.when(m2 > 0, m4 / (m2 * m2)).alias("kurt"),
            "p25",
            "median",
            "p75",
            "mode",
        )
    )
