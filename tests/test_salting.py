import numpy as np
import pandas as pd

from mpds_spark.operators.asof import asof_join
from mpds_spark.operators.salting import hot_entity_stats, salted_asof_join
from mpds_spark.operators.windows import derived_features


def _skewed_tables(seed=41, n_entities=6, hot_mult=100):
    """One entity with hot_mult x the rows of the others (skew fixture)."""
    rng = np.random.default_rng(seed)
    frames_l, frames_r = [], []
    for e in range(n_entities):
        n = 30 * (hot_mult if e == 0 else 1)
        lts = np.sort(rng.uniform(0, 10 * 86400, n))
        frames_l.append(
            pd.DataFrame(
                {"entity_id": f"e{e}", "ts": lts, "lv": rng.normal(size=n)}
            )
        )
        m = max(n // 3, 2)
        rts = np.sort(rng.uniform(0, 10 * 86400, m))
        frames_r.append(
            pd.DataFrame(
                {"entity_id": f"e{e}", "ts": rts, "rv": rng.normal(size=m).round(4)}
            )
        )
    return (
        pd.concat(frames_l, ignore_index=True),
        pd.concat(frames_r, ignore_index=True),
    )


def test_salted_asof_equals_unsalted(spark):
    lpdf, rpdf = _skewed_tables()
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    plain = (
        asof_join(left, right)
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    salted = (
        salted_asof_join(left, right, chunk_span=86400.0)
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    assert len(plain) == len(salted) == len(lpdf)
    for c in ("rv", "ts_r"):
        a = plain[c].to_numpy(dtype=float)
        b = salted[c].to_numpy(dtype=float)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), f"salted mismatch in {c}"


def test_window_ops_survive_hot_entity(spark):
    """The sort-based paths must handle a 100x hot entity and return results
    equal to a pandas groupby reference (no salting required)."""
    lpdf, _ = _skewed_tables(hot_mult=100)
    df = spark.createDataFrame(lpdf)
    got = (
        derived_features(df, value="lv")
        .orderBy("entity_id", "ts")
        .select("entity_id", "ts", "dss_avg")
        .toPandas()
    )
    import oracles

    exp = (
        lpdf.sort_values(["entity_id", "ts"])
        .groupby("entity_id", group_keys=False)
        .apply(lambda g: oracles.derived_features(g, value="lv", ts="ts"))
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["dss_avg"].to_numpy(), exp["dss_avg"].to_numpy(), rtol=1e-12
    )


def test_hot_entity_stats(spark):
    lpdf, _ = _skewed_tables(hot_mult=50)
    stats = hot_entity_stats(spark.createDataFrame(lpdf))
    assert stats[0][0] == "e0"
    assert stats[0][2] > 0.8  # hot entity holds >80% of rows


def test_salted_expanding_sum_equals_plain(spark):
    import numpy as np
    from pyspark.sql import Window, functions as F

    from mpds_spark.operators.salting import salted_expanding_sum

    lpdf, _ = _skewed_tables(seed=101, hot_mult=60)
    # integer values -> exact equality between summation trees
    lpdf["lv"] = np.round(lpdf["lv"] * 100).astype("int64").astype("float64")
    df = spark.createDataFrame(lpdf)
    got = (
        salted_expanding_sum(df, "lv", chunk_span=86400.0)
        .orderBy("entity_id", "ts")
        .toPandas()["cumsum"]
        .to_numpy()
    )
    w = (
        Window.partitionBy("entity_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = (
        df.withColumn("cumsum", F.sum("lv").over(w))
        .orderBy("entity_id", "ts")
        .toPandas()["cumsum"]
        .to_numpy()
    )
    np.testing.assert_array_equal(got, exp)


def _hot_series(seed=7, hot_mult=100, null_frac=0.35, int_values=True):
    """100x hot-entity fixture with CONSECUTIVE integer timestamps per
    entity: dt == 1 everywhere, so the rate terms are integers and the
    two-pass summation trees are exact (the bit-equality convention from
    test_salted_expanding_sum). null_frac of values are null (LOCF food)."""
    rng = np.random.default_rng(seed)
    frames = []
    for e in range(6):
        n = 30 * (hot_mult if e == 0 else 1)
        vals = rng.normal(size=n)
        if int_values:
            vals = np.round(vals * 50).astype("int64").astype("float64")
        vals[rng.uniform(size=n) < null_frac] = np.nan
        frames.append(
            pd.DataFrame(
                {
                    "entity_id": f"e{e}",
                    # start at 1: cum(t) must never be 0 (ANSI divide check)
                    "ts": np.arange(1, n + 1, dtype="float64"),
                    "lv": vals,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _assert_cols_equal(a, b, cols):
    for c in cols:
        x = a[c].to_numpy(dtype=float)
        y = b[c].to_numpy(dtype=float)
        same = (x == y) | (np.isnan(x) & np.isnan(y))
        assert same.all(), f"salted mismatch in {c}: {np.where(~same)[0][:5]}"


def test_salted_locf_bit_equal_to_plain(spark):
    """VERDICT r2 #3: salted LOCF (per-chunk last + carried chunk-prefix)
    must be BIT-identical to the unsalted window LOCF on the 100x
    hot-entity fixture — last() is a selection, no float arithmetic."""
    from mpds_spark.operators.backfill import locf
    from mpds_spark.operators.salting import salted_locf

    pdf = _hot_series(int_values=False)  # floats fine: no summation
    df = spark.createDataFrame(pdf)
    kw = dict(value="lv", valid_time=3.0, default=-1.0)
    plain = locf(df, **kw).orderBy("entity_id", "ts").toPandas()
    salted = (
        salted_locf(df, chunk_span=256.0, **kw)
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    assert list(plain.columns) == list(salted.columns)
    _assert_cols_equal(
        plain, salted, ["lv_locf", "lv_time_since_sample", "lv_locf_expir"]
    )


def test_salted_derived_features_bit_equal_to_plain(spark):
    """VERDICT r2 #3: all 9 expanding features decomposed two-pass must be
    bit-equal to the single-window derived_features on integer-valued data
    (exact summation trees), on the 100x hot-entity fixture with nulls."""
    from mpds_spark.operators.salting import salted_derived_features

    pdf = _hot_series(int_values=True)
    df = spark.createDataFrame(pdf)
    feats = [
        "dss_avg", "dss_ht_avg", "dss_ht_sq_avg", "dss_max", "dss_min",
        "dss_rate_avg", "dss_rate_ht_avg", "dss_abs_rate_avg",
        "dss_abs_rate_ht_avg",
    ]
    plain = (
        derived_features(df, value="lv").orderBy("entity_id", "ts").toPandas()
    )
    salted = (
        salted_derived_features(df, value="lv", chunk_span=256.0)
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    assert list(salted.columns) == list(df.columns) + feats
    _assert_cols_equal(plain, salted, feats)


def test_salted_derived_features_close_on_floats(spark):
    """General float data: summation trees differ across chunk boundaries,
    so the contract is allclose(1e-12), not bit-equality."""
    from mpds_spark.operators.salting import salted_derived_features

    pdf = _hot_series(seed=13, hot_mult=40, int_values=False)
    df = spark.createDataFrame(pdf)
    plain = (
        derived_features(df, value="lv").orderBy("entity_id", "ts").toPandas()
    )
    salted = (
        salted_derived_features(df, value="lv", chunk_span=100.0)
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    for c in ("dss_avg", "dss_ht_avg", "dss_abs_rate_ht_avg", "dss_max"):
        np.testing.assert_allclose(
            salted[c].to_numpy(), plain[c].to_numpy(), rtol=1e-12, atol=1e-12
        )


def test_salted_key_no_collision_numeric_suffix_entities(spark):
    """ADVICE r1 (high): entity 'u1' at chunk 12 and entity 'u11' at chunk 2
    must NOT merge into one salted group. With a collision, u11's right row
    would leak into u1's as-of matches (or vice versa); the salted join now
    keys on the (entity, chunk) two-column composite, so no string encoding
    exists to collide, and the salted result equals the unsalted exactly."""
    day = 86400.0
    lpdf = pd.DataFrame(
        {
            # u1 rows live in chunks 11-12, u11 rows in chunks 1-2:
            # concat without a separator gives 'u112' for BOTH (u1|12, u11|2)
            "entity_id": ["u1", "u1", "u11", "u11"],
            "ts": [11.5 * day, 12.5 * day, 1.5 * day, 2.5 * day],
            "lv": [1.0, 2.0, 3.0, 4.0],
        }
    )
    rpdf = pd.DataFrame(
        {
            "entity_id": ["u1", "u11"],
            "ts": [11.2 * day, 1.2 * day],
            "rv": [100.0, 200.0],
        }
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    plain = asof_join(left, right).orderBy("entity_id", "ts").toPandas()
    salted = (
        salted_asof_join(left, right, chunk_span=day)
        .orderBy("entity_id", "ts")
        .toPandas()
    )
    assert plain[["entity_id", "ts", "rv"]].equals(
        salted[["entity_id", "ts", "rv"]]
    )
    # and each entity matched its OWN right row
    by_e = {r.entity_id: set(salted[salted.entity_id == r.entity_id]["rv"])
            for r in right.collect()}
    assert by_e["u1"] == {100.0} and by_e["u11"] == {200.0}


def test_salted_trailing_windows_bit_equal_to_plain(spark):
    """Time-chunk + boundary-replay trailing windows must be BIT-identical
    to the single-window trailing_window_features on a 100x hot entity
    with integer cents — including rows landing EXACTLY on a chunk
    boundary and exactly at (chunk_end - horizon), the two replay
    edges."""
    import datetime as dt

    import numpy as np

    from mpds_spark.operators.salting import salted_trailing_windows
    from mpds_spark.operators.windows import trailing_window_features

    rng = np.random.default_rng(17)
    span = 6 * 3600.0  # 6 h chunks over 1 h / 3 h horizons
    base = dt.datetime(2024, 5, 1)
    rows, eid = [], 0

    def add(uid, t_us, v):
        nonlocal eid
        rows.append(
            (eid, uid, base + dt.timedelta(microseconds=int(t_us)), int(v))
        )
        eid += 1

    # hot entity: 100x the cold ones, spanning ~5 chunks
    t = 0
    for _ in range(500):
        t += int(rng.integers(1, 400) * 1e6)
        add(1, t, rng.integers(-999, 999))
    # planted boundary edges for the hot entity: exactly on a chunk
    # boundary, exactly horizon-distance before one, and 1 us inside
    for k in (1, 2, 3):
        add(1, k * span * 1e6, 111)
        add(1, k * span * 1e6 - 3 * 3600 * 1e6, 222)   # == chunk_end - wmax
        add(1, k * span * 1e6 - 1, 333)
    for uid in (2, 3, 4):
        t = int(rng.integers(0, 3600) * 1e6)
        for _ in range(5):
            t += int(rng.integers(1, 7200) * 1e6)
            add(uid, t, rng.integers(-999, 999))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, c long"
    )
    horizons = {"1h": 3600.0, "3h": 3 * 3600.0}
    kw = dict(value="c", ts="ts", horizons=horizons, extra=("event_id",))
    plain = {
        r["event_id"]: r
        for r in trailing_window_features(df, by="user_id", **kw).collect()
    }
    salted = {
        r["event_id"]: r
        for r in salted_trailing_windows(
            df, entity="user_id", chunk_span=span, **kw
        ).collect()
    }
    assert set(plain) == set(salted) and len(plain) == len(rows)
    for k, p in plain.items():
        assert salted[k].asDict() == p.asDict(), k


def test_salted_trailing_windows_rejects_short_chunk(spark):
    import datetime as dt

    import pytest as _pytest

    from mpds_spark.operators.salting import salted_trailing_windows

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1)], "e long, ts timestamp, c long"
    )
    with _pytest.raises(ValueError, match="chunk_span"):
        salted_trailing_windows(
            df, value="c", ts="ts", entity="e",
            horizons={"1d": 86400.0}, chunk_span=3600.0,
        )


def test_hot_key_audit_matches_counter(spark):
    """log2 bucket histogram matches a Counter rederivation, with exact
    power-of-two counts landing in the right bucket (the floor(log2())
    -on-a-double hazard the bin()-length encoding avoids)."""
    from collections import Counter

    from mpds_spark.operators.salting import hot_key_audit

    sizes = {1: 1, 2: 2, 3: 3, 4: 4, 5: 8, 6: 9, 7: 15, 8: 16, 9: 100}
    rows = [
        (uid, i) for uid, n in sizes.items() for i in range(n)
    ]
    df = spark.createDataFrame(rows, "user_id long, x long")
    got = {r["log2_bucket"]: r.asDict() for r in hot_key_audit(
        df, entity="user_id").collect()}
    buckets = {}
    for n in sizes.values():
        b = n.bit_length() - 1
        buckets.setdefault(b, []).append(n)
    assert set(got) == set(buckets)
    for b, ns in buckets.items():
        r = got[b]
        assert r["n_entities"] == len(ns)
        assert r["n_events"] == sum(ns)
        assert r["min_count"] == min(ns)
        assert r["max_count"] == max(ns)
