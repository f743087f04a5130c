

def test_exact_quantiles_bracketed_matches_percentile(spark):
    """Bracketed selection == Spark's exact percentile aggregate on
    even/odd counts, duplicate-heavy and high-cardinality columns."""
    import numpy as np
    from pyspark.sql import functions as F

    from mpds_spark.operators.scale import exact_quantiles_bracketed

    rng = np.random.default_rng(11)
    rows = [
        (float(rng.integers(0, 5)), float(rng.normal() * 1e4), float(i))
        for i in range(1001)  # odd n
    ]
    df = spark.createDataFrame(rows, ["dupes", "wide", "seq"])
    for p in (0.5, 0.25, 0.85):
        got = exact_quantiles_bracketed(df, ["dupes", "wide", "seq"], p=p)
        exp = df.agg(
            *[
                F.expr(f"percentile({c}, {p})").alias(c)
                for c in ("dupes", "wide", "seq")
            ]
        ).collect()[0]
        for c in ("dupes", "wide", "seq"):
            assert got[c] == float(exp[c]), (p, c, got[c], float(exp[c]))
    # even n (interpolation between two distinct order stats)
    df2 = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], ["x"])
    assert exact_quantiles_bracketed(df2, ["x"], p=0.5)["x"] == 2.5


def test_exact_grouped_quantiles_matches_percentile(spark):
    """Grouped bracketed selection == groupBy + exact percentile, incl.
    interpolating fracs (0.25/0.75), single-row groups, duplicate-heavy
    groups."""
    import numpy as np
    from pyspark.sql import functions as F

    from mpds_spark.operators.scale import exact_grouped_quantiles

    rng = np.random.default_rng(5)
    rows = []
    for g, n in (("a", 1), ("b", 2), ("c", 501), ("d", 1000)):
        vals = (
            [7.25]
            if n == 1
            else rng.normal(scale=1e4, size=n).round(2).tolist()
        )
        rows += [(g, float(v)) for v in vals]
    rows += [("e", 3.0)] * 40  # all-duplicates group
    df = spark.createDataFrame(rows, ["k", "x"])
    for p in (0.5, 0.25, 0.75, 0.9):
        got = {
            r["k"]: r["q_x"]
            for r in exact_grouped_quantiles(df, "k", "x", p=p).collect()
        }
        exp = {
            r["k"]: float(r["e"])
            for r in df.groupBy("k")
            .agg(F.expr(f"percentile(x, {p})").alias("e"))
            .collect()
        }
        assert got == exp, (p, got, exp)


def test_grouped_matlab_moments_matches_numpy_kernels(spark):
    """Distributed moment battery == the numpy MATLAB-convention kernels
    per group (prctile midpoint grid, std n-1, biased skew/kurt,
    smallest-tie mode), on groups of odd/even/tied compositions."""
    import numpy as np

    from mpds_spark.functions import mlstats as M
    from mpds_spark.operators.scale import grouped_matlab_moments

    rng = np.random.default_rng(17)
    rows = []
    for g, size in (("a", 11), ("b", 20), ("c", 1), ("d", 50)):
        vals = np.round(rng.normal(100, 25, size=size), 2)
        if g == "d":
            vals[:10] = 77.77  # forced mode + ties
        rows += [(g, float(v)) for v in vals]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = {r["g"]: r for r in grouped_matlab_moments(df, "g", "x").collect()}
    pdf = {g: np.array([v for gg, v in rows if gg == g]) for g in "abcd"}
    for g, x in pdf.items():
        r = got[g]
        assert r["n"] == len(x)
        np.testing.assert_allclose(r["mean"], x.mean(), rtol=1e-12)
        np.testing.assert_allclose(r["std"], M.matlab_std(x), rtol=1e-12)
        if len(x) > 1:
            np.testing.assert_allclose(r["skew"], M.skewness(x), rtol=1e-10)
            np.testing.assert_allclose(r["kurt"], M.kurtosis(x), rtol=1e-10)
        for p, name in ((25, "p25"), (50, "median"), (75, "p75")):
            np.testing.assert_allclose(
                r[name], M.prctile(x, p)[0], rtol=1e-12, err_msg=f"{g}:{name}"
            )
        np.testing.assert_allclose(r["median"], M.matlab_median(x), rtol=1e-12)
        np.testing.assert_allclose(r["mode"], M.matlab_mode(x), rtol=0)


def test_multi_quantile_matches_single_and_numpy(spark):
    """One-pass K-quantile == K single-pass calls == numpy quantile_cont,
    across small (exact-bracket) and large (t-digest-bracket) groups."""
    import numpy as np

    from mpds_spark.operators.scale import (
        exact_grouped_quantiles,
        exact_grouped_quantiles_multi,
    )

    rng = np.random.default_rng(31)
    rows = []
    for g, size in (("a", 30), ("b", 500), ("c", 2)):
        for v in np.round(rng.normal(50, 20, size=size), 3):
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, ["g", "x"])
    ps = [1 / 3, 0.5, 2 / 3]
    multi = {
        (r["g"], round(r["p"], 9)): r["q_x"]
        for r in exact_grouped_quantiles_multi(df, "g", "x", ps).collect()
    }
    assert len(multi) == 9
    for p in ps:
        single = {
            r["g"]: r["q_x"]
            for r in exact_grouped_quantiles(df, "g", "x", p=p).collect()
        }
        for g in "abc":
            assert multi[(g, round(p, 9))] == single[g], (g, p)
    for g, size in (("a", 30), ("b", 500), ("c", 2)):
        x = np.array([v for gg, v in rows if gg == g])
        for p in ps:
            np.testing.assert_allclose(
                multi[(g, round(p, 9))],
                np.quantile(x, p),
                rtol=1e-12,
                err_msg=f"{g}:{p}",
            )


def _naive_cap(rows, n):
    """Reference: n smallest md5(seed|group|key) per group, tie-break key."""
    import hashlib
    from collections import defaultdict

    per = defaultdict(list)
    for g, k in rows:
        u = hashlib.md5(f"cap|{g}|{k}".encode()).hexdigest()
        per[g].append((u, k))
    keep = set()
    for g, lst in per.items():
        for _, k in sorted(lst)[:n]:
            keep.add((g, k))
    return keep


def test_cap_per_group_matches_naive(spark):
    """cap_per_group == naive top-n-by-hash, including on a hot group
    1000x larger than the others."""
    from mpds_spark.operators.sampling import cap_per_group

    rows = [("hot", i) for i in range(3000)] + [
        (f"g{j}", 10_000 + j * 100 + i) for j in range(5) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        (r["source"], r["doc_id"])
        for r in cap_per_group(df, n=7, seed="cap").collect()
    }
    assert got == _naive_cap(rows, 7)


def test_cap_per_group_fallback_path_exact(spark):
    """guard small enough that the prefilter underselects (or empties)
    groups — the verified fallback must still return the exact naive set."""
    from mpds_spark.operators.sampling import cap_per_group

    rows = [("hot", i) for i in range(2000)] + [("tiny", 9000 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        (r["source"], r["doc_id"])
        for r in cap_per_group(df, n=5, seed="cap", guard=0.002).collect()
    }
    assert got == _naive_cap(rows, 5)


def test_trimmed_mean_enumeration(spark):
    """trimmed_mean vs explicit sort-and-slice on a frame with an
    outlier the trim must remove (and a group too small to trim)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from mpds_spark.queries import q_trimmed_mean  # noqa: F401 (shape)
    from pyspark.sql import Window

    rows = ([("big", i, float(v)) for i, v in enumerate(
        list(range(1, 20)) + [10000])]   # 20 rows, one huge outlier
        + [("tiny", 100 + i, float(v)) for i, v in enumerate([5, 7])])
    pdf = pd.DataFrame(rows, columns=["priority", "o_orderkey",
                                      "o_totalprice"])
    od = spark.createDataFrame(pdf).select(
        "priority", "o_orderkey",
        (F.signum("o_totalprice") * F.floor(
            F.abs(F.col("o_totalprice")) * 100 + F.lit(0.5)
        )).cast("long").alias("__c"),
    )
    w = Window.partitionBy("priority").orderBy("__c", "o_orderkey")
    wn = Window.partitionBy("priority")
    d = od.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    cut = F.floor(F.col("__n") / 10).cast("long")
    kept = (F.col("__rn") > cut) & (
        F.col("__rn") <= F.col("__n") - cut
    )
    g = {
        r["priority"]: r
        for r in d.groupBy("priority").agg(
            F.sum(F.when(kept, F.col("__c")).otherwise(0)).alias("s"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("k"),
        ).collect()
    }
    # big: trim 2 from each tail -> keep ranks 3..18 = values 3..18
    want = sum(range(3, 19)) * 100
    assert (g["big"]["s"], g["big"]["k"]) == (want, 16)
    # tiny: n//10 == 0 -> nothing trimmed
    assert (g["tiny"]["s"], g["tiny"]["k"]) == (1200, 2)
