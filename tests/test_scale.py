

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
