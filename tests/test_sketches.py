"""Differential tests for operators/sketches.py: registers/cells must
match a pure-Python rebuild of the same md5-derived sketch, and the
estimators must respect their published guarantees."""

import hashlib
import math

import numpy as np
import pandas as pd

from mpds_spark.operators.sketches import (
    countmin_estimates,
    hll_alpha,
    hll_cardinality,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll(keys, p=8):
    m = 1 << p
    rbits = 60 - p
    regs = {}
    for k in keys:
        h = _h60(str(k))
        b, r = h >> rbits, h % (1 << rbits)
        rho = rbits + 1 if r == 0 else rbits + 1 - r.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    z = sum(1.0 / (1 << regs[b]) for b in sorted(regs)) + (m - len(regs))
    raw = hll_alpha(m) * m * m / z
    v = m - len(regs)
    if raw <= 2.5 * m and v > 0:
        return len(regs), m * math.log(m / v)
    return len(regs), raw


def test_hll_matches_python_rebuild(spark):
    rng = np.random.default_rng(11)
    rows = [
        (f"g{i % 3}", int(k))
        for i, k in enumerate(rng.integers(0, 2000, size=6000))
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "key"])
    got = (
        hll_cardinality(
            spark.createDataFrame(pdf), key="key", group="grp", p=8
        )
        .orderBy("grp")
        .toPandas()
        .set_index("grp")
    )
    for g, sub in pdf.groupby("grp"):
        keys = set(sub["key"])
        hit, est = _py_hll(keys)
        r = got.loc[g]
        assert r["n_exact"] == len(keys)
        assert r["hll_buckets_hit"] == hit
        assert abs(r["hll_estimate"] - est) < 1e-9 * max(1.0, est)
        # published std error ~1.04/sqrt(256) = 6.5%; allow 4 sigma
        assert abs(r["rel_err"]) < 0.26


def test_hll_small_range_correction(spark):
    """A handful of keys must route through linear counting and come
    out nearly exact."""
    pdf = pd.DataFrame({"key": list(range(12)) * 3})
    got = hll_cardinality(
        spark.createDataFrame(pdf), key="key", p=8
    ).collect()[0]
    assert got["n_exact"] == 12
    # linear counting with 12 occupied of 256 buckets is near-exact
    assert abs(got["hll_estimate"] - 12) < 1.0


def test_hll_rejects_bad_p(spark):
    import pytest

    pdf = pd.DataFrame({"key": [1]})
    with pytest.raises(ValueError):
        hll_cardinality(spark.createDataFrame(pdf), key="key", p=2)


def test_countmin_one_sided_and_skew(spark):
    """Every estimate must be >= the exact count (one-sided guarantee)
    and the planted heavy hitter must surface with a tight estimate —
    its relative overcount is bounded by the cell-collision mass."""
    rng = np.random.default_rng(13)
    keys = list(rng.integers(0, 500, size=4000)) + [999999] * 2000
    pdf = pd.DataFrame({"key": [int(k) for k in keys]})
    got = countmin_estimates(
        spark.createDataFrame(pdf), key="key", d=4, w=256, k=10
    ).toPandas()
    assert len(got) == 10
    assert (got["overcount"] >= 0).all()
    assert (got["cm_estimate"] >= got["n_exact"]).all()
    hh = got.set_index("key").loc[999999]
    assert hh["n_exact"] == 2000
    # E[collision mass per cell] = 4000/256 ~ 16; min over 4 rows is
    # far below 10x that — generous determinism-safe bound
    assert hh["overcount"] < 200
    # exact counts must agree with pandas
    vc = pdf["key"].value_counts()
    for _, r in got.iterrows():
        assert r["n_exact"] == vc[r["key"]]


def test_bloom_membership_one_sided(spark):
    """No false negatives ever; false positives exactly match the
    pure-Python rebuild of the same md5 bit set."""
    from mpds_spark.operators.sketches import bloom_membership

    ref_keys = [str(i) for i in range(0, 40)]
    probe_keys = [str(i) for i in range(0, 200)]
    m, k = 128, 3
    ref = spark.createDataFrame(
        pd.DataFrame({"key": ref_keys})
    )
    probe = spark.createDataFrame(pd.DataFrame({"key": probe_keys}))
    got = bloom_membership(ref, probe, key="key", m=m, k=k).toPandas()
    bits = {
        _h60(f"{i}|{kk}") % m for kk in ref_keys for i in range(k)
    }
    want_pos = {
        kk
        for kk in probe_keys
        if all(_h60(f"{i}|{kk}") % m in bits for i in range(k))
    }
    assert len(got) == len(probe_keys)
    for _, r in got.iterrows():
        kk = r["key"]
        assert r["bloom_positive"] == (kk in want_pos)
        assert r["actual_member"] == (kk in set(ref_keys))
        if r["actual_member"]:
            assert r["bloom_positive"]  # one-sided: no false negatives
        assert r["false_positive"] == (
            r["bloom_positive"] and not r["actual_member"]
        )
    # with 40 keys in 128 bits, collisions guarantee a few FPs
    assert got["false_positive"].sum() > 0


def test_hll_rolling_merge_matches_python(spark):
    """Merged trailing-window registers must equal the pure-Python
    rebuild (daily max-merge), and the estimate must track the exact
    trailing distinct within the sketch's error envelope."""
    import math

    from mpds_spark.operators.sketches import hll_alpha, hll_rolling_merge

    rng = np.random.default_rng(19)
    rows = []
    for d in range(20):
        for _ in range(200):
            rows.append(
                (float(d * 86400 + rng.integers(0, 86400)),
                 int(rng.integers(0, 800)))
            )
    pdf = pd.DataFrame(rows, columns=["ts", "key"])
    sdf = spark.createDataFrame(pdf).selectExpr(
        "to_timestamp(ts) AS ts", "key"
    )
    got = (
        hll_rolling_merge(sdf, key="key", ts="ts", window_days=3, p=8)
        .toPandas()
        .set_index("day")
    )

    p, m, rbits = 8, 256, 52
    daily = {}
    daysets = {}
    for ts, k in rows:
        d = int(ts // 86400)
        h = _h60(str(k))
        b, r = h >> rbits, h % (1 << rbits)
        rho = rbits + 1 if r == 0 else rbits + 1 - r.bit_length()
        daily.setdefault(d, {})
        daily[d][b] = max(daily[d].get(b, 0), rho)
        daysets.setdefault(d, set()).add(k)
    days = sorted(daily)
    assert set(got.index) == set(days)
    for d in days:
        regs = {}
        exact = set()
        for dd in range(d - 2, d + 1):
            for b, mm in daily.get(dd, {}).items():
                regs[b] = max(regs.get(b, 0), mm)
            exact |= daysets.get(dd, set())
        z = sum(1.0 / (1 << regs[b]) for b in sorted(regs)) + (
            m - len(regs)
        )
        raw = hll_alpha(m) * m * m / z
        v = m - len(regs)
        est = m * math.log(m / v) if raw <= 2.5 * m and v > 0 else raw
        r = got.loc[d]
        assert r["n_exact"] == len(exact)
        assert r["hll_buckets_hit"] == len(regs)
        assert abs(r["hll_estimate"] - est) < 1e-9 * max(1.0, est)
        assert abs(r["rel_err"]) < 0.26


def test_ams_f2_matches_python_rebuild(spark):
    """ams_f2's sign counters and median-of-means must equal a pure
    Python rebuild with the same md5-parity signs, and the exact leg
    must equal the brute-force sum of squared frequencies."""
    from mpds_spark.operators.sketches import ams_f2

    keys = (["a"] * 7 + ["b"] * 3 + ["c"] * 5 + ["d"] * 1
            + [f"k{i}" for i in range(20)])
    pdf = pd.DataFrame({"key": keys})
    r = ams_f2(spark.createDataFrame(pdf), key="key").collect()[0]

    from collections import Counter

    f = Counter(keys)
    f2 = sum(v * v for v in f.values())
    ys = []
    for j in range(16):
        y = 0
        for k in keys:
            h = hashlib.md5(f"ams{j}|{k}".encode()).hexdigest()
            y += 1 if int(h[0], 16) % 2 else -1
        ys.append(y)
    means = sorted(
        sum(y * y for y in ys[g * 4:(g + 1) * 4]) / 4.0 for g in range(4)
    )
    est = (means[1] + means[2]) / 2.0
    assert r["n_rows"] == len(keys)
    assert r["f2_exact"] == f2
    assert r["f2_est"] == est
    assert r["rel_err"] == (est - float(f2)) / float(f2)
