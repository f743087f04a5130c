"""behavior_divergence vs a numpy/Counter rederivation.

KL uses the entity-support convention (p << q holds by construction: a
category the entity produced exists globally); TV includes the absent-
category mass. Signature regimes: an entity matching the global mix
scores ~0 on both; a single-category entity scores the maximal KL
-ln(q_top); ties on the modal category break to the greatest name.
"""

import datetime as dt
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from mpds_spark.operators.profiles import behavior_divergence


def test_behavior_divergence_matches_numpy(spark):
    seqs = {
        1: ["a"] * 10 + ["b"] * 10 + ["c"] * 10,  # mirrors a 1:1:1 world
        2: ["a"] * 30,  # point mass
        3: ["b"] * 15 + ["c"] * 15,  # missing 'a' entirely
        4: ["a"] * 5 + ["b"] * 5 + ["c"] * 2,  # modal tie a/b -> 'b'
    }
    rows, eid = [], 0
    for uid, types in seqs.items():
        for i, t in enumerate(types):
            rows.append(
                (eid, uid,
                 dt.datetime(2024, 9, 1) + dt.timedelta(seconds=i), t)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["user_id"]: r.asDict()
        for r in behavior_divergence(
            df, state="event_type", by="user_id"
        ).collect()
    }
    glob = Counter(t for ts in seqs.values() for t in ts)
    N = sum(glob.values())
    for uid, types in seqs.items():
        cnt = Counter(types)
        n = len(types)
        kl = sum(
            (c / n) * np.log((c / n) / (glob[s] / N)) for s, c in cnt.items()
        )
        tv = 0.5 * sum(
            abs(cnt.get(s, 0) / n - g / N) for s, g in glob.items()
        )
        r = got[uid]
        assert r["n_events"] == n
        assert r["n_types"] == len(cnt)
        assert r["kl_global"] == pytest.approx(kl, abs=1e-9)
        assert r["tv_global"] == pytest.approx(tv, abs=1e-12)
        top = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert r["top_type"] == top
    assert got[2]["kl_global"] == pytest.approx(
        -np.log(glob["a"] / N), abs=1e-9
    )
    assert got[3]["n_types"] == 2  # 'a' absent: TV carries its mass
    assert got[4]["top_type"] == "b"  # 5-5 tie -> greatest name
    assert got[1]["kl_global"] < got[2]["kl_global"]


def test_benford_audit_matches_counter(spark):
    """benford_audit's digit counts / chi2 / MAD must reproduce the
    direct Counter computation with the same literal probabilities and
    digit-ascending fold order."""
    import math

    from mpds_spark.operators.profiles import benford_audit

    rng = np.random.default_rng(31)
    rows = []
    for g in ["x", "y"]:
        # log-uniform magnitudes: spans several decades so every first
        # digit appears; a few non-positive values must be dropped
        vals = 10 ** rng.uniform(-1, 4, size=400)
        rows += [(g, round(float(v), 2)) for v in vals]
    rows += [("x", 0.0), ("y", -12.5), ("x", 0.004)]  # 0 cents after snap
    pdf = pd.DataFrame(rows, columns=["group_id", "value"])
    got = (
        benford_audit(spark.createDataFrame(pdf))
        .orderBy("group_id")
        .toPandas()
        .set_index("group_id")
    )
    for g, sub in pdf.groupby("group_id"):
        cents = [
            int(math.copysign(math.floor(abs(v) * 100 + 0.5), v))
            for v in sub["value"]
        ]
        digits = [int(str(c)[0]) for c in cents if c > 0]
        n = len(digits)
        obs = {d: digits.count(d) for d in range(1, 10)}
        chi2 = 0.0
        mad = 0.0
        for d in range(1, 10):
            p = math.log10(1.0 + 1.0 / d)
            e = n * p
            chi2 += (obs[d] - e) * (obs[d] - e) / e
            mad += abs(obs[d] / n - p)
        mad /= 9.0
        r = got.loc[g]
        assert r["n"] == n
        for d in range(1, 10):
            assert r[f"d{d}"] == obs[d], (g, d)
        assert abs(r["chi2"] - chi2) < 1e-9 * max(1.0, chi2)
        assert abs(r["mad"] - mad) < 1e-12
