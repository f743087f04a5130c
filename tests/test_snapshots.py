"""Differential tests for the snapshot/bar/trailing-window operators:
brute-force pandas/numpy rederivations on adversarial fixtures
(timestamp ties, boundary-inclusive cutoffs, single-row bars)."""

import datetime as dt

import numpy as np
import pytest

from pyspark.sql import functions as F


def _cents(col):
    return (
        F.signum(col) * F.floor(F.abs(F.col(col)) * 100 + F.lit(0.5))
    ).cast("long")


def test_trailing_window_matches_brute_force(spark):
    """n_<h>/sum_<h> equal the brute-force 'all rows with us in
    [us_i - W, us_i]' per row — including TIED timestamps, where the
    SQL RANGE frame must include every peer row (even ones later in
    tie-break order) on both engines."""
    from mpds_spark.operators.windows import trailing_window_features

    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for uid in (1, 2, 3):
        t = 0
        for _ in range(40):
            # mix sub-window hops with window-clearing jumps, plus
            # exact ties (step 0) to exercise the peer rule
            t += int(rng.choice([0, 1, 50, 3600, 4000]) * 1e6)
            v = int(rng.integers(-500, 500))  # cents
            rows.append(
                (eid, uid, base + dt.timedelta(microseconds=t), v)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, c long"
    )
    out = trailing_window_features(
        df, value="c", ts="ts", by="user_id",
        horizons={"1h": 3600.0, "2h": 7200.0}, extra=("event_id",),
    ).collect()
    got = {r["event_id"]: r for r in out}
    by_uid = {}
    for eid_, uid, ts, v in rows:
        by_uid.setdefault(uid, []).append((eid_, ts, v))
    for uid, evs in by_uid.items():
        uss = np.array(
            [int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
             for _, ts, _ in evs], dtype="int64",
        )
        vs = np.array([v for _, _, v in evs], dtype="int64")
        for i, (eid_, ts, v) in enumerate(evs):
            r = got[eid_]
            for name, w_us in (("1h", 3_600_000_000), ("2h", 7_200_000_000)):
                m = (uss >= uss[i] - w_us) & (uss <= uss[i])
                assert r[f"n_{name}"] == int(m.sum()), (uid, eid_, name)
                assert r[f"sum_{name}"] == int(vs[m].sum()), (uid, eid_, name)
            assert r["ts_s"] == pytest.approx(uss[i] / 1e6, abs=0)


def test_trailing_window_rejects_nonpositive_horizon(spark):
    from mpds_spark.operators.windows import trailing_window_features

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1)], "e long, ts timestamp, c long"
    )
    with pytest.raises(ValueError, match="positive"):
        trailing_window_features(
            df, value="c", ts="ts", by="e", horizons={"bad": 0.0}
        )


def test_rfm_snapshot_matches_brute_force(spark):
    """Frequency/recency/tenure/monetary + the 90-day conditional pair
    match a pandas rederivation; rows AFTER the cutoff never leak in;
    a row exactly AT the cutoff and one exactly at the recent-window
    lower bound are both INCLUDED (closed bounds on both edges)."""
    from mpds_spark.operators.snapshots import rfm_snapshot

    cutoff = dt.datetime(1998, 6, 30)
    day = dt.timedelta(days=1)
    rows = [
        # entity 1: boundary rows — at cutoff, at cutoff-90d, after cutoff
        (1, cutoff, 10_00),
        (1, cutoff - 90 * day, 20_00),
        (1, cutoff + dt.timedelta(microseconds=1), 999_00),  # leaked?
        (1, cutoff - 400 * day, 5_50),
        # entity 2: everything old
        (2, cutoff - 200 * day, 7_25),
        (2, cutoff - 300 * day - dt.timedelta(seconds=1), 3_10),
        # entity 3: only post-cutoff -> absent from the snapshot
        (3, cutoff + day, 1_00),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, amt_c long")
    out = {
        r["k"]: r.asDict()
        for r in rfm_snapshot(
            df, entity="k", ts="ts", amount="amt_c",
            cutoff="1998-06-30 00:00:00",
        ).collect()
    }
    assert set(out) == {1, 2}
    e1 = out[1]
    assert e1["frequency"] == 3
    assert e1["recency_days"] == 0
    assert e1["tenure_days"] == 400
    assert int(e1["monetary_c"]) == 10_00 + 20_00 + 5_50
    assert e1["n_recent"] == 2  # at-cutoff + at-lower-bound rows
    assert int(e1["monetary_recent_c"]) == 10_00 + 20_00
    assert e1["last_ts_s"] == pytest.approx(
        (cutoff - dt.datetime(1970, 1, 1)).total_seconds(), abs=0
    )
    e2 = out[2]
    assert e2["frequency"] == 2
    assert e2["recency_days"] == 200
    # 300 days + 1 s -> floor = 300
    assert e2["tenure_days"] == 300
    assert e2["n_recent"] == 0
    assert int(e2["monetary_recent_c"]) == 0


def test_ohlc_bars_matches_brute_force(spark):
    """open/high/low/close match a numpy rederivation per (user, day)
    bucket, with tie-broken open/close picks under equal timestamps and
    single-event bars collapsing to open=high=low=close."""
    from mpds_spark.operators.snapshots import ohlc_bars

    rng = np.random.default_rng(11)
    base = dt.datetime(2024, 2, 1)
    rows = []
    eid = 0
    for uid in (1, 2):
        for d in range(3):
            n = int(rng.integers(1, 6))
            for _ in range(n):
                # coarse offsets force intra-bucket timestamp ties
                off = int(rng.choice([0, 1, 1, 7200, 7200, 86000]))
                ts = base + dt.timedelta(days=d, seconds=off)
                rows.append((eid, uid, ts, int(rng.integers(-999, 999))))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, c long"
    )
    out = ohlc_bars(
        df, entity="user_id", ts="ts", value="c",
        tiebreak="event_id", bucket_s=86400,
    ).collect()
    got = {(r["user_id"], r["bar_start_s"]): r for r in out}
    buckets = {}
    epoch = dt.datetime(1970, 1, 1)
    for eid_, uid, ts, v in rows:
        us = int((ts - epoch).total_seconds() * 1e6)
        bar = us // 86_400_000_000
        buckets.setdefault((uid, bar * 86400.0), []).append((us, eid_, v))
    assert set(got) == set(buckets)
    for key, evs in buckets.items():
        evs.sort()  # (us, event_id) ascending — the tie-break order
        r = got[key]
        assert r["n_events"] == len(evs)
        assert r["open_c"] == evs[0][2]
        assert r["close_c"] == evs[-1][2]
        assert r["high_c"] == max(v for _, _, v in evs)
        assert r["low_c"] == min(v for _, _, v in evs)
        if len(evs) == 1:
            assert (
                r["open_c"] == r["high_c"] == r["low_c"] == r["close_c"]
            )
