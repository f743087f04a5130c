"""Differential tests for operators/survival.py: the windowed KM fold
must reproduce the textbook product-limit estimator computed directly in
Python (exact risk sets; float product in ascending-duration order)."""

import math

import numpy as np
import pandas as pd

from mpds_spark.operators.survival import kaplan_meier


def _km(durations_obs, bin_us):
    """(duration_us, observed) pairs -> {bin: (n_risk, d, c, S)}."""
    binned = [(int(d) // bin_us, o) for d, o in durations_obs]
    days = sorted({b for b, _ in binned})
    total = len(binned)
    out = {}
    surv = 1.0
    left_before = 0
    for day in days:
        d = sum(1 for b, o in binned if b == day and o)
        c = sum(1 for b, o in binned if b == day and not o)
        n_risk = total - left_before
        if d == n_risk:
            surv = 0.0
        elif d > 0:
            surv = surv * math.exp(
                math.log(float(n_risk - d) / float(n_risk))
            )
        out[day] = (n_risk, d, c, surv)
        left_before += d + c
    return out


def test_kaplan_meier_matches_direct(spark):
    rng = np.random.default_rng(17)
    rows = []
    horizon = 40 * 86400
    for e in range(60):
        start = int(rng.integers(0, 5 * 86400))
        life = int(rng.integers(0, 30 * 86400))
        n_ev = int(rng.integers(2, 6))
        ts = np.sort(rng.integers(0, max(life, 1), size=n_ev - 1))
        for t in [0, *ts.tolist(), life]:
            rows.append((f"e{e}", float(start + t)))
    pdf = pd.DataFrame(rows, columns=["entity_id", "ts"])
    sdf = spark.createDataFrame(pdf).selectExpr(
        "entity_id", "to_timestamp(ts) AS ts"
    )
    got = (
        kaplan_meier(
            sdf, churn_gap_days=7.0, bin_seconds=86400
        )
        .orderBy("duration_bin")
        .toPandas()
        .set_index("duration_bin")
    )

    g = pdf.groupby("entity_id")["ts"]
    mx = pdf["ts"].max()
    pairs = [
        (
            int((last - first) * 1e6),
            last <= mx - 7 * 86400,
        )
        for first, last in zip(g.min(), g.max())
    ]
    want = _km(pairs, 86400 * 1_000_000)
    assert set(got.index) == set(want)
    for day, (n_risk, d, c, s) in want.items():
        r = got.loc[day]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (
            n_risk,
            d,
            c,
        ), day
        assert abs(r["km_survival"] - s) < 1e-12, day


def test_kaplan_meier_all_events_hits_zero(spark):
    """With no censoring (gap 0 puts every entity past the boundary
    except the one holding the corpus max), the curve's last row has
    d == n_risk and S must be exactly 0 there."""
    rows = []
    for e, life_days in enumerate([1, 1, 2, 3]):
        rows.append((f"e{e}", 0.0))
        rows.append((f"e{e}", float(life_days * 86400)))
    # a sentinel entity that ends much later so the others all churn
    rows += [("late", 0.0), ("late", float(100 * 86400))]
    pdf = pd.DataFrame(rows, columns=["entity_id", "ts"])
    sdf = spark.createDataFrame(pdf).selectExpr(
        "entity_id", "to_timestamp(ts) AS ts"
    )
    got = (
        kaplan_meier(sdf, churn_gap_days=0.0, bin_seconds=86400)
        .orderBy("duration_bin")
        .toPandas()
    )
    last = got.iloc[-1]
    assert last["duration_bin"] == 100
    assert last["n_events"] == last["n_risk"] == 1
    assert last["km_survival"] == 0.0
    # monotone non-increasing survival
    s = got["km_survival"].to_numpy()
    assert (np.diff(s) <= 1e-15).all()
    assert got.iloc[0]["n_risk"] == 5
