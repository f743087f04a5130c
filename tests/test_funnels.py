"""retention_cohorts / conversion_funnel vs brute-force Python rederivations.

The funnel chain semantics (first step-k event STRICTLY after step k-1,
optional within-bound) and the cohort week bucketing are re-derived with
plain dict/loop code over the same rows — any Spark window/when-chain
ordering bug shows up as a stage or cell mismatch here.
"""

import datetime as dt

import pytest

from mpds_spark.operators.funnels import conversion_funnel, retention_cohorts


def _monday(d: dt.date) -> dt.date:
    return d - dt.timedelta(days=d.weekday())


def test_retention_cohorts_matches_bruteforce(spark):
    rows, eid = [], 0
    # cohort A (week of 2024-01-01): users 1,2 first-seen that week;
    # user 1 active weeks 0,1,3; user 2 weeks 0,1. cohort B: user 3.
    activity = {
        1: ["2024-01-02", "2024-01-03", "2024-01-10", "2024-01-24"],
        2: ["2024-01-04", "2024-01-08"],
        3: ["2024-01-09", "2024-01-09", "2024-01-23"],
    }
    for uid, days in activity.items():
        for d in days:
            rows.append((eid, uid, dt.datetime.fromisoformat(d + "T12:00:00")))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in retention_cohorts(df, ts="ts", by="user_id").collect()
    }
    # brute force
    cells: dict[tuple[str, int], set] = {}
    cohort: dict[int, dt.date] = {}
    for uid, days in activity.items():
        weeks = sorted({_monday(dt.date.fromisoformat(d)) for d in days})
        cohort[uid] = weeks[0]
        for w in weeks:
            off = (w - weeks[0]).days // 7
            cells.setdefault((weeks[0].isoformat(), off), set()).add(uid)
    sizes = {
        c: len(us) for (c, off), us in cells.items() if off == 0
    }
    want = {
        (c, off): (len(us), sizes[c], len(us) / sizes[c])
        for (c, off), us in cells.items()
    }
    assert set(got) == set(want)
    for k, (n, size, rate) in want.items():
        gn, gsize, grate = got[k]
        assert (gn, gsize) == (n, size)
        assert grate == pytest.approx(rate, abs=1e-12)
    # spot: cohort A week 0 has 2 users, week 1 retention 1.0
    a = _monday(dt.date(2024, 1, 2)).isoformat()
    assert got[(a, 0)][0] == 2 and got[(a, 1)][2] == pytest.approx(1.0)


def _brute_funnel(events, steps, within=None):
    """events: list of (us, type) per user already; returns stage, lag."""
    lim = None if within is None else int(within * 1_000_000)
    ts = sorted(events)
    chain = []
    prev = None
    for s in steps:
        cand = [
            u
            for (u, t) in ts
            if t == s
            and (prev is None or u > prev)
            and (prev is None or lim is None or u <= prev + lim)
        ]
        if not cand:
            break
        prev = min(cand)
        chain.append(prev)
    return len(chain), (chain[-1] - chain[0]) if chain else None


@pytest.mark.parametrize("within", [None, 50.0])
def test_conversion_funnel_matches_bruteforce(spark, within):
    steps = ("view", "click", "purchase")
    base = dt.datetime(2024, 5, 1)
    seqs = {
        # full conversion, tight
        1: [(0, "view"), (10, "click"), (20, "purchase")],
        # click before first view must NOT count; later click does
        2: [(0, "click"), (5, "view"), (9, "purchase"), (30, "click"),
            (40, "purchase")],
        # conversion only without the within bound (gap 60 s)
        3: [(0, "view"), (70, "click"), (80, "purchase")],
        # no first step at all -> stage 0
        4: [(0, "purchase"), (5, "click")],
        # same-instant click as view: strictly-after excludes it
        5: [(0, "view"), (0, "click"), (15, "click")],
    }
    rows, eid = [], 0
    for uid, evs in seqs.items():
        for sec, et in evs:
            rows.append(
                (eid, uid, base + dt.timedelta(seconds=sec), et)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = conversion_funnel(
        df, steps=steps, event_type="event_type", ts="ts", by="user_id",
        within=within,
    ).collect()
    want_stage = {}
    want_lag = {}
    for uid, evs in seqs.items():
        st, lag = _brute_funnel(
            [(int(s * 1e6), t) for s, t in evs], steps, within
        )
        want_stage[uid] = st
        want_lag[uid] = lag
    # rollup
    from collections import defaultdict

    n_by_stage = defaultdict(int)
    lag_by_stage = defaultdict(list)
    for uid, st in want_stage.items():
        n_by_stage[st] += 1
        if st > 0:
            lag_by_stage[st].append(want_lag[uid])
    got = {r["stage"]: r.asDict() for r in out}
    assert set(got) == set(n_by_stage)
    for st, n in n_by_stage.items():
        assert got[st]["n_entities"] == n
        if st > 0:
            mean_s = sum(lag_by_stage[st]) / n / 1e6
            assert got[st]["mean_s_to_stage"] == pytest.approx(
                mean_s, abs=1e-9
            )
            assert got[st]["step"] == steps[st - 1]
        else:
            assert got[st]["step"] is None
    # semantic spots
    if within is None:
        assert want_stage[3] == 3
    else:
        assert want_stage[3] == 1  # 70 s gap breaks the 50 s bound
    assert want_stage[4] == 0
    assert want_stage[5] == 2  # the t=0 click is excluded, t=15 counts


def test_conversion_funnel_requires_two_steps(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1), "a")],
                               "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError, match="at least 2"):
        conversion_funnel(df, steps=("a",))


def test_temporal_motifs_bruteforce(spark):
    """Motif counts must match direct per-entity triple enumeration
    with the same (ts, tiebreak) order and span rule."""
    from collections import Counter

    import numpy as np
    import pandas as pd

    from mpds_spark.operators.funnels import temporal_motifs

    rng = np.random.default_rng(5)
    kinds = ["a", "b", "c"]
    rows = []
    rid = 0
    for e in range(10):
        t = 0
        for _ in range(int(rng.integers(5, 40))):
            t += int(rng.integers(1, 900))
            rows.append((f"e{e}", float(t), kinds[rng.integers(0, 3)], rid))
            rid += 1
    pdf = pd.DataFrame(rows, columns=["entity_id", "ts", "event_type", "event_id"])
    sdf = spark.createDataFrame(pdf).selectExpr(
        "entity_id", "to_timestamp(ts) AS ts", "event_type", "event_id"
    )
    got = temporal_motifs(
        sdf, max_span=1200.0, k=10, tiebreak=("event_id",)
    ).collect()

    cnt = Counter()
    for _, g in pdf.groupby("entity_id"):
        g = g.sort_values(["ts", "event_id"])
        ks = g["event_type"].tolist()
        tss = g["ts"].tolist()
        for i in range(len(ks) - 2):
            if tss[i + 2] - tss[i] <= 1200.0:
                cnt[(ks[i], ks[i + 1], ks[i + 2])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [((r["t1"], r["t2"], r["t3"]), r["n"]) for r in got] == want


def test_window_funnel_bruteforce(spark):
    """window_funnel's latest-start fold vs exhaustive chain
    enumeration (all index triples in order within the window) —
    including the case a min-start greedy would get wrong: an early
    chain start that times out while a later one completes."""
    import datetime

    import pandas as pd

    from mpds_spark.operators.funnels import window_funnel

    def t(m):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(
            minutes=m
        )

    W_MIN = 60  # 1h window
    series = {
        # early view at 0 times out; view at 100 -> click 130 ->
        # purchase 150 completes. min-start greedy would fail this.
        "late_chain": [(0, "view"), (100, "view"), (130, "click"),
                       (150, "purchase")],
        # click before view: no chain beyond view
        "out_of_order": [(0, "click"), (10, "view"), (200, "purchase")],
        # full chain inside window
        "quick": [(0, "view"), (5, "click"), (10, "purchase")],
        # purchase within window of chain start but click outside
        "click_late": [(0, "view"), (70, "click"), (80, "purchase")],
        # no relevant events
        "noise": [(0, "error"), (10, "signup")],
    }
    rows = [
        (e, t(m), ev) for e, evs in series.items() for m, ev in evs
    ]
    pdf = pd.DataFrame(rows, columns=["entity_id", "ts", "event_type"])
    got = {
        r["entity_id"]: r["funnel_depth"]
        for r in window_funnel(
            spark.createDataFrame(pdf),
            chain=("view", "click", "purchase"),
            window_us=W_MIN * 60 * 1000000,
        ).collect()
    }

    chain = ["view", "click", "purchase"]
    for e, evs in series.items():
        best = 0
        n = len(evs)
        # exhaustive: all increasing index tuples matching a chain prefix
        import itertools

        for k in (1, 2, 3):
            for idx in itertools.combinations(range(n), k):
                if all(evs[idx[j]][1] == chain[j] for j in range(k)) and \
                   (evs[idx[-1]][0] - evs[idx[0]][0]) <= W_MIN and \
                   all(evs[idx[j]][0] - evs[idx[0]][0] <= W_MIN
                       for j in range(k)):
                    best = max(best, k)
        assert got[e] == best, (e, got[e], best)
    assert got["late_chain"] == 3
    assert got["click_late"] == 1
