"""Differential tests for operators/encoding.py target_encode_oof:
brute-force pandas OOF computation, prior fallback when a category
lives in a single fold, and fold determinism under repartitioning."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mpds_spark.operators.encoding import fold_assign, target_encode_oof


@pytest.fixture(scope="module")
def frame(spark):
    rows = []
    # category 'a': spread across folds; 'b': skewed; 'solo': will land
    # in whichever single fold its one key hashes to (prior fallback).
    for i in range(200):
        rows.append((i, "a" if i % 3 else "b", 1 if i % 4 == 0 else 0))
    rows.append((9999, "solo", 1))
    return spark.createDataFrame(rows, "key long, cat string, y long")


def _brute(pdf: pd.DataFrame, m: float = 10.0) -> pd.DataFrame:
    out = []
    for _, r in pdf.iterrows():
        oth = pdf[pdf["fold"] != r["fold"]]
        g_s, g_c = oth["y"].sum(), len(oth)
        prior = g_s / g_c
        cat = oth[oth["cat"] == r["cat"]]
        te = (cat["y"].sum() + m * prior) / (len(cat) + m)
        out.append((r["key"], te))
    return pd.DataFrame(out, columns=["key", "te_brute"])


def test_oof_matches_bruteforce(frame):
    enc = target_encode_oof(
        frame, category="cat", target="y", key="key", n_folds=5, m=10.0
    )
    pdf = enc.select("key", "cat", "y", "fold", "te_cat").toPandas()
    brute = _brute(pdf[["key", "cat", "y", "fold"]])
    merged = pdf.merge(brute, on="key")
    assert (merged["te_cat"] - merged["te_brute"]).abs().max() < 1e-12


def test_solo_category_degrades_to_prior(frame):
    enc = target_encode_oof(
        frame, category="cat", target="y", key="key", n_folds=5, m=10.0
    )
    pdf = enc.toPandas()
    solo = pdf[pdf["cat"] == "solo"].iloc[0]
    oth = pdf[pdf["fold"] != solo["fold"]]
    prior = oth["y"].sum() / len(oth)
    assert solo["te_cat"] == pytest.approx(prior, abs=1e-12)


def test_row_never_sees_own_label(frame):
    """Flipping one row's label must not move that row's encoding
    (its fold is excluded from its own statistics)."""
    enc0 = target_encode_oof(
        frame, category="cat", target="y", key="key", n_folds=5
    )
    base = {
        r["key"]: (r["fold"], r["te_cat"]) for r in enc0.collect()
    }
    # flip key=0 (cat 'b', y=1 -> 0)
    flipped = frame.withColumn(
        "y", F.when(F.col("key") == 0, F.lit(0)).otherwise(F.col("y"))
    )
    enc1 = target_encode_oof(
        flipped, category="cat", target="y", key="key", n_folds=5
    )
    fold0 = base[0][0]
    for r in enc1.collect():
        if r["fold"] == fold0:
            # rows IN the flipped row's fold keep their encoding:
            # their statistics exclude that fold entirely
            assert r["te_cat"] == base[r["key"]][1]


def test_fold_deterministic_under_repartition(frame):
    a = frame.withColumn("fold", fold_assign(F.col("key"), 7))
    b = frame.repartition(13).withColumn("fold", fold_assign(F.col("key"), 7))
    pa = {r["key"]: r["fold"] for r in a.collect()}
    pb = {r["key"]: r["fold"] for r in b.collect()}
    assert pa == pb
    assert set(pa.values()) <= set(range(7))


def test_woe_encoding_matches_direct(spark):
    import math

    from mpds_spark.operators.encoding import woe_encoding

    rows = (
        [("a", True)] * 30 + [("a", False)] * 10
        + [("b", True)] * 5 + [("b", False)] * 45
        + [("c", True)] * 7  # empty negative cell: smoothing guard
    )
    pdf = pd.DataFrame(rows, columns=["category", "label"])
    got = (
        woe_encoding(spark.createDataFrame(pdf))
        .orderBy("category")
        .toPandas()
        .set_index("category")
    )
    pt = sum(1 for _, l in rows if l)
    nt = len(rows) - pt
    for c in ["a", "b", "c"]:
        p = sum(1 for g, l in rows if g == c and l)
        n = sum(1 for g, l in rows if g == c and not l)
        woe = math.log((p + 0.5) * nt / ((n + 0.5) * pt))
        iv = (p / pt - n / nt) * woe
        r = got.loc[c]
        assert (r["n_pos"], r["n_neg"]) == (p, n)
        assert abs(r["woe"] - woe) < 1e-12
        assert abs(r["iv_term"] - iv) < 1e-12
