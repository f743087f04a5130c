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


def benford_audit(
    df: DataFrame,
    group: str = "group_id",
    value: str = "value",
    decimals: int = 2,
) -> DataFrame:
    """Benford first-significant-digit audit per group (Benford 1938;
    the classic fabricated-numbers / broken-feed detector for financial
    and measurement columns): observed first-digit counts of the
    positive values vs the Benford law p(d) = log10(1 + 1/d), with the
    chi-square statistic and the mean absolute deviation.

    Cross-engine determinism: values are snapped to exact integers at
    `decimals` (the engine's cents convention) and the first digit is
    taken from the integer's decimal STRING — never via log10, whose
    boundary behavior at exact powers of ten is libm-dependent. Digit
    counts are exact longs; the expected probabilities are embedded as
    repr'd double literals (identical parse on both engines); chi2 and
    MAD are folded digit-ascending as explicit left-associated 9-term
    chains, so the float summation order is pinned.

    Shape at scale: one map stage + ONE group-keyed aggregation (nine
    conditional counts in the same agg); chi2/MAD are per-row
    expressions over the aggregated frame. Zero joins, zero windows.

    Returns (group, n, d1..d9, chi2, mad).
    """
    import math

    scale = int(10**decimals)
    cents = (
        F.signum(F.col(value))
        * F.floor(F.abs(F.col(value)) * scale + F.lit(0.5))
    ).cast("long")
    d = (
        df.select(F.col(group).alias("__g"), cents.alias("__c"))
        .filter(F.col("__c") > 0)
        .withColumn(
            "__d", F.substring(F.col("__c").cast("string"), 1, 1).cast("int")
        )
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")] + [
        F.sum(F.when(F.col("__d") == dgt, 1).otherwise(0))
        .cast("long")
        .alias(f"d{dgt}")
        for dgt in range(1, 10)
    ]
    out = d.groupBy(F.col("__g").alias(group)).agg(*aggs)
    nd = F.col("n").cast("double")
    chi2 = None
    mad = None
    for dgt in range(1, 10):
        p = F.lit(math.log10(1.0 + 1.0 / dgt))
        obs = F.col(f"d{dgt}").cast("double")
        exp_n = nd * p
        t = (obs - exp_n) * (obs - exp_n) / exp_n
        a = F.abs(obs / nd - p)
        chi2 = t if chi2 is None else chi2 + t
        mad = a if mad is None else mad + a
    return out.withColumn("chi2", chi2).withColumn(
        "mad", mad / F.lit(9.0)
    )


def welch_pairs(
    df: DataFrame,
    group: str = "group_id",
    value: str = "value",
    decimals: int = 2,
) -> DataFrame:
    """Welch's unequal-variance t statistic for every pair of groups
    (Welch 1947) — the A/B-metric significance audit run across all
    treatment arms at once.

    Cross-engine determinism: per-group moments are exact DECIMAL(38,0)
    sums over integer cents; mean and variance each incur ONE double
    division (variance via the computational identity
    (n*Sxx - Sx^2) / (n*(n-1)), numerator and denominator exact);
    t and the Welch–Satterthwaite dof are then fixed-order double
    expressions. sqrt is IEEE-correctly-rounded on both engines.

    Shape at scale: ONE group-keyed aggregation over the fact table;
    the pair expansion is a self-join of the |groups|-sized aggregate
    frame only. Returns (g1, g2, n1, n2, mean_diff, t_stat, dof) for
    g1 < g2, groups with n >= 2.
    """
    scale = int(10**decimals)
    cents = (
        F.signum(F.col(value))
        * F.floor(F.abs(F.col(value)) * scale + F.lit(0.5))
    ).cast("long")
    dec = "decimal(38,0)"
    g = (
        df.select(F.col(group).alias("__g"), cents.alias("__y"))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("__y").cast(dec)).alias("sx"),
            F.sum(
                F.col("__y").cast(dec) * F.col("__y").cast(dec)
            ).alias("sxx"),
        )
        .filter(F.col("n") >= 2)
    )
    nd = F.col("n").cast(dec)
    mean = F.col("sx").cast("double") / F.col("n").cast("double") / F.lit(
        float(scale)
    )
    var = (
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / (nd * (nd - F.lit(1).cast(dec))).cast("double")
        / F.lit(float(scale * scale))
    )
    g = g.select("__g", "n", mean.alias("m"), var.alias("v"))
    a = g.select(
        F.col("__g").alias("g1"),
        F.col("n").alias("n1"),
        F.col("m").alias("m1"),
        F.col("v").alias("v1"),
    )
    b = g.select(
        F.col("__g").alias("g2"),
        F.col("n").alias("n2"),
        F.col("m").alias("m2"),
        F.col("v").alias("v2"),
    )
    p = a.join(b, F.col("g1") < F.col("g2"))
    se1 = F.col("v1") / F.col("n1").cast("double")
    se2 = F.col("v2") / F.col("n2").cast("double")
    t = (F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2)
    dof = ((se1 + se2) * (se1 + se2)) / (
        se1 * se1 / (F.col("n1") - 1).cast("double")
        + se2 * se2 / (F.col("n2") - 1).cast("double")
    )
    return p.select(
        "g1",
        "g2",
        "n1",
        "n2",
        (F.col("m1") - F.col("m2")).alias("mean_diff"),
        t.alias("t_stat"),
        dof.alias("dof"),
    )


def chi2_independence(
    df: DataFrame,
    row: str = "row_key",
    col: str = "col_key",
) -> DataFrame:
    """Chi-square test of independence over the (row x col) contingency
    table, with Cramér's V — the are-these-two-categoricals-related
    audit (hour-of-day vs event mix, source vs language).

    Cross-engine determinism: cell/marginal/total counts are exact
    longs from ONE aggregation (marginals via windows over the
    |cells|-sized frame — no second scan); expected = rt*ct/N and each
    cell's contribution (o-e)^2/e are fixed double expressions; the
    chi2 total folds the contributions in (row, col)-sorted order on
    both engines (sorted-array fold over the tiny cell frame).

    Returns one row per cell: (row, col, obs, expected, contrib,
    chi2_total, dof, cramers_v).
    """
    cells = df.groupBy(
        F.col(row).alias("__r"), F.col(col).alias("__c")
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    w_all = Window.partitionBy()
    w_r = Window.partitionBy("__r")
    w_c = Window.partitionBy("__c")
    cells = (
        cells.withColumn("__rt", F.sum("obs").over(w_r).cast("long"))
        .withColumn("__ct", F.sum("obs").over(w_c).cast("long"))
        .withColumn("__n", F.sum("obs").over(w_all).cast("long"))
        .withColumn(
            "__nr",
            F.size(F.collect_set("__r").over(w_all)).cast("long"),
        )
        .withColumn(
            "__nc",
            F.size(F.collect_set("__c").over(w_all)).cast("long"),
        )
    )
    expected = (
        (F.col("__rt") * F.col("__ct")).cast("double")
        / F.col("__n").cast("double")
    )
    contrib = (
        (F.col("obs").cast("double") - expected)
        * (F.col("obs").cast("double") - expected)
        / expected
    )
    cells = cells.withColumn("expected", expected).withColumn(
        "contrib", contrib
    )
    total = F.aggregate(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__r"), F.col("__c"), F.col("contrib"))
            ).over(w_all)
        ),
        F.lit(0.0),
        lambda acc, s: acc + s["contrib"],
    )
    dof = (F.col("__nr") - 1) * (F.col("__nc") - 1)
    cells = cells.withColumn("chi2_total", total)
    vmin = F.least(F.col("__nr") - 1, F.col("__nc") - 1)
    cramers = F.sqrt(
        F.col("chi2_total")
        / (F.col("__n") * vmin).cast("double")
    )
    return cells.select(
        F.col("__r").alias(row),
        F.col("__c").alias(col),
        "obs",
        "expected",
        "contrib",
        "chi2_total",
        dof.cast("long").alias("dof"),
        cramers.alias("cramers_v"),
    )


def spearman_corr(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Spearman rank correlation between two exact-integer unit metrics
    (plus the raw Pearson r beside it — the rank/raw gap is the
    classic outlier-sensitivity audit): average ranks with proper tie
    handling, then the Pearson formula on DOUBLED ranks so every rank
    is an exact integer and every moment an exact DECIMAL(38,0).

    Average rank of value v = |{u < v}| + (|{u == v}| + 1)/2, computed
    WITHOUT a global sort of the units: group to the distinct-value
    frame (tiny — bounded by the metric's domain), one cumulative
    window over that frame, broadcast-join back. Doubling makes it
    integer: r2 = 2*cnt_lt + cnt_eq + 1. The at-scale variant for
    truly high-cardinality metrics is the range-partitioned sort +
    boundary-count carry two-pass; the distinct-value frame here IS
    the practical shape for counts/cents metrics.

    Determinism: rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) *
    (n*Syy - Sy^2)) with every numerator/denominator an exact decimal
    cast once to double — one multiply, one sqrt, one division per
    statistic on both engines. The doubling cancels algebraically.

    Returns ONE row (n_units, spearman_rho, pearson_r)."""

    def _rank2(d: DataFrame, col: str, out: str) -> DataFrame:
        vf = d.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("__c"))
        wc = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        vf = vf.withColumn(
            "__lt", F.coalesce(F.sum("__c").over(wc), F.lit(0))
        )
        vf = vf.select(
            col,
            (2 * F.col("__lt") + F.col("__c") + 1).cast("long").alias(out),
        )
        return d.join(F.broadcast(vf), col)

    dec = "decimal(38,0)"
    d = _rank2(_rank2(df, x, "__rx"), y, "__ry")
    xd, yd = F.col(x).cast(dec), F.col(y).cast(dec)
    rxd, ryd = F.col("__rx").cast(dec), F.col("__ry").cast(dec)
    mo = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(rxd).alias("srx"),
        F.sum(ryd).alias("sry"),
        F.sum(rxd * rxd).alias("srxx"),
        F.sum(ryd * ryd).alias("sryy"),
        F.sum(rxd * ryd).alias("srxy"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n_units").cast(dec)

    def _r(sx, sy, sxx, syy, sxy):
        num = (n * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        dx = (n * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        dy = (n * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        return num / F.sqrt(dx * dy)

    return mo.select(
        "n_units",
        _r("srx", "sry", "srxx", "sryy", "srxy").alias("spearman_rho"),
        _r("sx", "sy", "sxx", "syy", "sxy").alias("pearson_r"),
    )


def cuped(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """CUPED variance-reduction audit (Deng, Xu, Kohavi & Walker, WSDM
    2013): theta = cov(x, y)/var(x) for a pre-period covariate x and a
    post-period metric y per unit, and the exact variance the adjusted
    metric y - theta*(x - xbar) would have — var(y) - cov^2/var(x) —
    derived ANALYTICALLY from the same exact moments, so no float fold
    over adjusted per-unit values is ever needed.

    Inputs are exact integer unit aggregates (e.g. cents); all moments
    are DECIMAL(38,0)-exact; every reported statistic is a fixed short
    expression over once-cast doubles (identical IEEE ops per engine).
    Variances are reported in squared metric units (the 10^4 cents
    rescale is an exact power-of-ten literal).

    Returns ONE row (n_units, theta, var_y, var_cuped, reduction_pct).
    Shape at scale: one unit-keyed upstream agg feeds a single global
    moment agg — two exchanges total, nothing wider."""
    dec = "decimal(38,0)"
    xd, yd = F.col(x).cast(dec), F.col(y).cast(dec)
    mo = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n_units").cast(dec)
    covn = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varxn = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    varyn = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    nd = F.col("n_units").cast("double")
    den = nd * nd * F.lit(10000.0)
    return mo.select(
        "n_units",
        (covn / varxn).alias("theta"),
        (varyn / den).alias("var_y"),
        ((varyn - covn * covn / varxn) / den).alias("var_cuped"),
        (F.lit(100.0) * covn * covn / (varxn * varyn)).alias(
            "reduction_pct"
        ),
    )
