"""validate(): one-pass expectation suite — violation counts, NULL
predicates counting as violations, uniqueness via distinct counting."""

import pytest

from mpds_spark.operators.validate import (
    in_range,
    is_in,
    matches,
    not_null,
    unique,
    validate,
)


def test_validate_counts_and_verdicts(spark):
    rows = [
        (1, "ok", 10, "en"),
        (2, None, 5, "en"),        # null text
        (3, "ok", -1, "xx"),       # range + lang violations
        (3, "dup", 7, "de"),       # duplicate doc_id
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n", "lang"])
    out = {
        r["rule"]: r
        for r in validate(
            df,
            [
                not_null("text"),
                unique("doc_id"),
                in_range("n", 0, 100),
                is_in("lang", ["en", "de"]),
                matches("text", "^o"),
            ],
        ).collect()
    }
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["not_null(text)"]["n_violations"] == 1
    assert out["unique(doc_id)"]["n_violations"] == 1
    assert out["in_range(n,0,100)"]["n_violations"] == 1
    assert out["is_in(lang)"]["n_violations"] == 1
    # NULL text -> matches() is NULL -> counted as violation; 'dup' fails too
    assert out["matches(text)"]["n_violations"] == 2
    assert not out["not_null(text)"]["passes"]
    clean = validate(
        df.filter("doc_id = 1"), [not_null("text"), unique("doc_id")]
    ).collect()
    assert all(r["passes"] for r in clean)


def test_unique_prefix_named_predicate_stays_predicate(spark):
    """ADVICE r3: rule dispatch is structural (Rule.kind), not display-name
    prefix — a caller-supplied predicate whose name starts with 'unique('
    must be counted as a predicate, not fed to count_distinct."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    rows = {
        r["rule"]: r
        for r in validate(
            df, [("unique(k) lookalike", F.col("k") == 1), unique("k")]
        ).collect()
    }
    look = rows["unique(k) lookalike"]
    assert look["n_violations"] == 0 and look["passes"]  # both rows satisfy k==1
    real = rows["unique(k)"]
    assert real["n_violations"] == 1 and not real["passes"]  # k=1 twice


def test_length_ks_drift_brute_force(spark):
    """numpy re-derivation of the exact two-sample KS statistic (each
    source vs rest) on a planted drift fixture: one source's lengths are
    shifted, its KS must dominate."""
    import numpy as np

    from mpds_spark.operators.validate import length_ks_drift

    rows = []
    did = 0
    for i in range(30):  # two baseline sources, same length law
        for src in ("a", "b"):
            rows.append((did, src, " ".join(["w"] * (5 + i % 7)))); did += 1
    for i in range(30):  # shifted source
        rows.append((did, "c", " ".join(["w"] * (20 + i % 5)))); did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r.asDict() for r in length_ks_drift(df).collect()}

    lens = {}
    for _, src, text in rows:
        lens.setdefault(src, []).append(len(text.split()))
    all_lens = sorted({x for v in lens.values() for x in v})
    for src, ls in lens.items():
        rest = [x for s2, v in lens.items() if s2 != src for x in v]
        ks = max(
            abs(
                sum(1 for x in ls if x <= t) / len(ls)
                - sum(1 for x in rest if x <= t) / len(rest)
            )
            for t in all_lens
        )
        assert got[src]["n_docs"] == len(ls)
        assert got[src]["ks_stat"] == pytest.approx(ks, abs=1e-12), src
    assert got["c"]["ks_stat"] > got["a"]["ks_stat"]
    assert got["c"]["ks_stat"] == 1.0  # fully disjoint supports


def test_gini_concentration_matches_numpy(spark):
    """Gini matches the sorted-rank formula on numpy, including the
    signature regimes: all-equal mass -> 0, one-doc-owns-everything ->
    (n-1)/n, ties in the middle (rank assignment must not matter),
    single-doc group -> 0, zero-mass group -> NULL."""
    import numpy as np

    from mpds_spark.operators.validate import gini_concentration

    rng = np.random.default_rng(23)
    data = {
        "equal": [100] * 8,                      # G = 0
        "monopoly": [0] * 9 + [500],             # G = (n-1)/n = 0.9
        "tied": [10, 10, 10, 40, 40, 900],       # tie-invariance
        "single": [77],                          # G = 0
        "zero": [0, 0, 0],                       # NULL
        "random": list(rng.integers(0, 1000, 50)),
    }
    rows, did = [], 0
    for src, xs in data.items():
        for x in xs:
            rows.append((did, src, int(x)))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r["source"]: r.asDict()
        for r in gini_concentration(df, value="n_chars", by="source").collect()
    }
    for src, xs in data.items():
        a = np.sort(np.array(xs, dtype="float64"))
        n, t = len(a), a.sum()
        r = got[src]
        assert r["n_docs"] == n
        assert r["total_mass"] == int(t)
        if t == 0:
            assert r["gini"] is None
        else:
            expect = (2 * np.sum(np.arange(1, n + 1) * a) - (n + 1) * t) / (
                n * t
            )
            assert r["gini"] == pytest.approx(expect, abs=1e-12), src
    assert got["equal"]["gini"] == 0.0
    assert got["monopoly"]["gini"] == pytest.approx(0.9, abs=0)
    assert got["single"]["gini"] == 0.0


def test_referential_audit_counts(spark):
    import pandas as pd

    from mpds_spark.operators.validate import referential_audit

    fact = spark.createDataFrame(
        pd.DataFrame({"fk": [1, 1, 2, 5, 5, 5, 7]})
    )
    dim = spark.createDataFrame(pd.DataFrame({"dk": [1, 2, 3, 4]}))
    r = referential_audit(fact, dim, "fk", "dk", "t").collect()[0]
    assert r["relation"] == "t"
    assert r["n_fact_rows"] == 7
    assert r["n_fact_keys"] == 4          # {1, 2, 5, 7}
    assert r["n_orphan_keys"] == 2        # {5, 7}
    assert r["n_orphan_rows"] == 4        # three 5s + one 7
    assert r["n_dim_keys"] == 4
    assert r["n_unreferenced_dim"] == 2   # {3, 4}


def test_join_size_audit_exact_and_estimate(spark):
    import pandas as pd

    from mpds_spark.operators.validate import join_size_audit

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2, 3, 9]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"j": [1, 1, 2, 2, 2, 4]})
    )
    r = join_size_audit(left, right, "k", "j", "t").collect()[0]
    # actual = 3*2 (k=1) + 1*3 (k=2) = 9
    assert r["actual_rows"] == 9
    assert (r["n_left"], r["n_right"]) == (6, 6)
    assert (r["ndv_left"], r["ndv_right"]) == (4, 3)
    est = 6 * 6 / 4
    assert abs(r["est_rows"] - est) < 1e-12
    assert abs(r["ratio"] - 9 / est) < 1e-12
    # disjoint keys -> zero actual, ratio 0
    right2 = spark.createDataFrame(pd.DataFrame({"j": [7, 8]}))
    r2 = join_size_audit(left, right2, "k", "j", "t2").collect()[0]
    assert r2["actual_rows"] == 0 and r2["ratio"] == 0.0


def test_k_anonymity_planted_classes(spark):
    """Planted QI classes of sizes 1/3/10 with known sensitive
    diversity: per-threshold risk counts must match exact enumeration."""
    from mpds_spark.operators.validate import k_anonymity

    rows = (
        [("x", 1, 100)]                                   # size 1
        + [("x", 2, v) for v in (5, 5, 7)]                # size 3, ldiv 2
        + [("y", 1, v) for v in range(10)]                # size 10, ldiv 10
    )
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["seg", "nat", "bal"])
    got = {
        r["k"]: r
        for r in k_anonymity(
            spark.createDataFrame(pdf), qi=("seg", "nat"),
            sensitive="bal", ks=(2, 5, 20),
        ).collect()
    }
    assert set(got) == {2, 5, 20}
    for k, below, risk in [(2, 1, 1), (5, 2, 4), (20, 3, 14)]:
        r = got[k]
        assert r["n_classes"] == 3
        assert r["min_class_size"] == 1
        assert r["min_l_div"] == 1
        assert r["classes_below"] == below
        assert r["rows_at_risk"] == risk
        assert r["risk_pct"] == 100.0 * risk / 14.0


def test_consistent_hash_audit_guarantee(spark):
    """The consistent-hashing contract on real keys: totals conserved,
    the grown ring's NEW node gains everything that moves, no existing
    node gains anything, and the moved share is far below 1/2 (vs
    modulo hashing which moves ~8/9 of all keys)."""
    import pandas as pd

    from mpds_spark.operators.validate import consistent_hash_audit

    pdf = pd.DataFrame({"key": range(2000)})
    rows = consistent_hash_audit(
        spark.createDataFrame(pdf), key="key", n_nodes=8, n_virtual=16
    ).collect()
    by = {r["node"]: r for r in rows}
    assert sum(r["n_before"] for r in rows) == 2000
    assert sum(r["n_after"] for r in rows) == 2000
    moved = sum(r["n_gained"] for r in rows)
    assert moved == sum(r["n_lost"] for r in rows)
    # only the new node gains
    assert by["node8"]["n_gained"] == by["node8"]["n_after"] == moved
    assert by["node8"]["n_before"] == 0
    for i in range(8):
        assert by[f"node{i}"]["n_gained"] == 0
    # moved share near 1/9, certainly below 1/3
    assert 0 < moved < 2000 / 3


def test_source_digest_partition_invariant(spark):
    """The content digest must be invariant to partitioning and row
    order, and flip on a single-byte change."""
    import hashlib

    import pandas as pd

    from pyspark.sql import functions as F

    rows = [(i, f"text {i}", "en", "s0", 10 + i) for i in range(50)]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )

    def digest(df):
        rh = df.select(
            "source",
            F.md5(F.concat_ws(
                "\x1f", F.col("doc_id").cast("string"), "text", "lang",
                F.col("n_chars").cast("string"))).alias("h"),
        )
        return rh.groupBy("source").agg(
            F.md5(F.array_join(F.array_sort(F.collect_list("h")), ""))
            .alias("d")
        ).collect()[0]["d"]

    a = digest(spark.createDataFrame(pdf))
    b = digest(spark.createDataFrame(
        pdf.sample(frac=1.0, random_state=7)).repartition(13))
    assert a == b
    # hashlib rebuild
    hs = sorted(
        hashlib.md5(
            f"{i}\x1f{t}\x1f{lg}\x1f{nc}".encode()
        ).hexdigest()
        for i, t, lg, _s, nc in rows
    )
    assert a == hashlib.md5("".join(hs).encode()).hexdigest()
    pdf2 = pdf.copy()
    pdf2.loc[0, "text"] = "text 0!"
    assert digest(spark.createDataFrame(pdf2)) != a


def test_lpt_partition_plan_greedy_rebuild(spark):
    """The LPT fold vs the explicit greedy in python on a skewed count
    set — and LPT must beat the ideal-bound ratio naive hash gets on
    the same skew."""
    import datetime

    import pandas as pd

    from mpds_spark.queries import q_lpt_partition_plan  # noqa: F401

    # drive the same fold via the catalog query on real data instead:
    rows = q_lpt_partition_plan(
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    counts = duckdb.sql(
        "SELECT user_id, count(*) c FROM "
        "'/root/testdata/sf0.001/events.parquet' GROUP BY user_id"
    ).fetchall()
    order = sorted(counts, key=lambda r: (-r[1], r[0]))
    loads = [0, 0, 0, 0]
    for _, c in order:
        i = loads.index(min(loads))
        loads[i] += c
    got = sorted((r["partition"], r["load"]) for r in rows)
    assert got == list(enumerate(loads))
    total = sum(c for _, c in counts)
    for r in rows:
        assert r["balance_ratio"] == r["load"] / (total / 4.0)
    # LPT keeps makespan within 4/3 of ideal (Graham 1969)
    assert max(loads) / (total / 4.0) <= 4.0 / 3.0 + 1e-9


def test_merkle_diff_localizes_changes(spark):
    """Only blocks holding an edited (doc_id%97==0) or deleted
    (doc_id%101==0) row may surface; every surfaced block must hold
    one; counts must reflect deletions."""
    from mpds_spark.queries import q_merkle_diff

    rows = q_merkle_diff(spark, "/root/testdata/sf0.001").collect()
    assert rows
    import duckdb

    ids = [i for (i,) in duckdb.sql(
        "SELECT doc_id FROM "
        "'/root/testdata/sf0.001/documents.parquet'").fetchall()]
    dirty = {i // 64 for i in ids if i % 97 == 0 or i % 101 == 0}
    got = {r["block"] for r in rows}
    assert got == dirty
    for r in rows:
        dels = sum(1 for i in ids
                   if i // 64 == r["block"] and i % 101 == 0)
        n1 = sum(1 for i in ids if i // 64 == r["block"])
        assert r["n_v1"] == n1
        assert r["n_v2"] == n1 - dels


def test_jackknife_ratio_formula(spark):
    """The delete-a-group jackknife SE vs explicit recomputation from
    the same hash groups."""
    import hashlib
    import math

    from mpds_spark.queries import q_jackknife_ratio

    r = q_jackknife_ratio(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT o_orderkey, CAST(floor(abs(o_totalprice)*100 + 0.5)"
        "*sign(o_totalprice) AS BIGINT) FROM "
        "'/root/testdata/sf0.001/orders.parquet'").fetchall()
    groups = {}
    for k, c in rows:
        g = int(hashlib.md5(f"jk|{k}".encode()).hexdigest()[:15], 16) % 20
        a, b = groups.get(g, (0, 0))
        groups[g] = (a + c, b + 1)
    sa = sum(a for a, _ in groups.values())
    sb = sum(b for _, b in groups.values())
    rs = [(sa - a) / (sb - b) for g, (a, b) in sorted(groups.items())]
    rbar = 0.0
    for x in rs:
        rbar += x
    rbar /= len(rs)
    ss = 0.0
    for x in rs:
        ss += (x - rbar) * (x - rbar)
    se = math.sqrt((len(rs) - 1) / len(rs) * ss)
    assert r["n_groups"] == len(rs) and r["n_orders"] == sb
    from mpds_spark.functions.timeutil import duck_round  # noqa: F401

    def r6(v):
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    assert r["avg_order_value"] == r6(sa / sb / 100.0)
    assert r["jackknife_se"] == r6(se / 100.0)


def test_rank_auc_brute_force(spark):
    """Tie-corrected rank-sum AUC/U/z vs literal enumeration of all
    pos x neg pairs (wins + half-ties) on the sf0.001 events."""
    import math

    from mpds_spark.queries import q_rank_auc

    r = q_rank_auc(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT),"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        " FROM '/root/testdata/sf0.001/events.parquet'").fetchall()
    pos = [c for c, p in rows if p]
    neg = [c for c, p in rows if not p]
    u = 0.0
    for a in pos:
        for b in neg:
            u += 1.0 if a > b else (0.5 if a == b else 0.0)
    n1, n0, n = len(pos), len(neg), len(rows)
    from collections import Counter

    t = Counter(c for c, _ in rows)
    tt = sum(v * v * v - v for v in t.values())
    var = n1 * n0 * ((n + 1) - tt / (n * (n - 1))) / 12.0
    z = (u - n1 * n0 / 2.0) / math.sqrt(var)

    def r6(v):
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    assert r["n_pos"] == n1 and r["n_neg"] == n0
    assert r["mann_whitney_u"] == u
    assert r["auc"] == r6(u / (n1 * n0))
    assert abs(r["z_score"] - r6(z)) <= 1e-6


def test_knn_shapley_vs_exact_coalitions(spark):
    """Jia et al. 2019 Theorem-1 recursion vs the LITERAL Shapley
    value — enumerating all 2^N coalitions of a planted 8-point
    training set with exact Fractions — for every training point,
    under the KNN utility v(S) = (1/K) * sum_{j<=min(K,|S|)}
    1[y_(j) = y]."""
    from fractions import Fraction
    from itertools import combinations
    from math import factorial

    from mpds_spark.operators.similarity import knn_shapley

    # planted: 8 train + 1 query, 2-dim ints so the int8 codes give a
    # clean deterministic neighbor order
    train = [
        (0, 1, [100.0, 0.0]),
        (1, 0, [90.0, 30.0]),
        (2, 1, [80.0, 50.0]),
        (3, 0, [60.0, 70.0]),
        (4, 1, [40.0, 80.0]),
        (5, 0, [20.0, 90.0]),
        (6, 1, [10.0, 95.0]),
        (7, 1, [0.0, 100.0]),
    ]
    query = [(100, 1, [99.0, 5.0])]
    K = 3
    tdf = spark.createDataFrame(
        [(i, lab, v) for i, lab, v in train],
        "vec_id long, label int, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(i, lab, v) for i, lab, v in query],
        "vec_id long, label int, embedding array<double>",
    )
    got = {
        r["train_id"]: r["mean_shapley"]
        for r in knn_shapley(tdf, qdf, k=K).collect()
    }

    # exact neighbor order by int8 integer dot (rebuild in python)
    import math as _m

    def codes(v):
        n = _m.sqrt(sum(x * x for x in v))
        return [int(_m.floor(abs(127.0 * x / n) + 0.5)
                    * (1 if x > 0 else (-1 if x < 0 else 0)))
                for x in v]

    qc = codes(query[0][2])
    scored = sorted(
        ((-sum(a * b for a, b in zip(codes(v), qc)), i, lab)
         for i, lab, v in train),
    )
    order = [(i, lab) for _, i, lab in scored]  # rank 1 first
    y = query[0][1]
    ids = [i for i, _ in order]
    I = {i: (1 if lab == y else 0) for i, lab in order}
    rank = {i: r + 1 for r, (i, _) in enumerate(order)}
    n = len(ids)

    def util(S):  # S = frozenset of ids
        if not S:
            return Fraction(0)
        mem = sorted(S, key=lambda i: rank[i])[:K]
        return Fraction(sum(I[i] for i in mem), K)

    for i in ids:
        others = [j for j in ids if j != i]
        val = Fraction(0)
        for sz in range(n):
            for S in combinations(others, sz):
                w = Fraction(
                    factorial(sz) * factorial(n - sz - 1), factorial(n)
                )
                val += w * (util(frozenset(S) | {i}) - util(frozenset(S)))
        assert abs(got[i] - float(val)) < 1e-12, (i, got[i], float(val))


def test_wasserstein_drift_brute_force(spark):
    """Exact W1/KS vs a literal python sweep over the merged support
    (and, as a cross-check, W1 via interpolated quantile functions is
    skipped — the CDF-integral IS the definition for step CDFs)."""
    from mpds_spark.queries import q_wasserstein_drift

    r = q_wasserstein_drift(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT),"
        " event_type FROM '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type IN ('purchase','click')").fetchall()
    a = sorted(c for c, t in rows if t == "purchase")
    b = sorted(c for c, t in rows if t == "click")
    na, nb = len(a), len(b)
    support = sorted(set(a) | set(b))
    w1n = 0
    ksn = 0
    for v, nxt in zip(support, support[1:] + [None]):
        cA = sum(1 for x in a if x <= v)
        cB = sum(1 for x in b if x <= v)
        num = abs(cA * nb - cB * na)
        ksn = max(ksn, num)
        if nxt is not None:
            w1n += num * (nxt - v)
    assert r["n_purchase"] == na and r["n_click"] == nb
    assert r["wasserstein"] == w1n / (na * nb) / 100.0
    assert r["ks_stat"] == ksn / (na * nb)


def test_cohens_kappa_cells(spark):
    """2x2 cells + kappa vs direct python recomputation; planted
    perfect-agreement and independence sanity bounds."""
    from mpds_spark.queries import q_cohens_kappa

    r = q_cohens_kappa(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT n_chars, text FROM "
        "'/root/testdata/sf0.001/documents.parquet'").fetchall()
    n11 = n00 = n10 = n01 = 0
    for nc, text in rows:
        ra = 1 if nc >= 120 else 0
        rb = 1 if (len(text) - len(text.replace(" ", "")) + 1) >= 20 else 0
        n11 += ra * rb
        n00 += (1 - ra) * (1 - rb)
        n10 += ra * (1 - rb)
        n01 += (1 - ra) * rb
    n = len(rows)
    rc = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
    assert (r["n_docs"], r["n_both_keep"], r["n_both_drop"],
            r["n_only_a"], r["n_only_b"]) == (n, n11, n00, n10, n01)
    assert r["p_observed"] == (n11 + n00) / n
    assert r["kappa"] == (n * (n11 + n00) - rc) / (n * n - rc)
    # kappa <= po always; kappa == 1 iff perfect agreement
    assert r["kappa"] <= r["p_observed"] + 1e-15


def test_calibration_bins_formula(spark):
    """Per-bin confidence/accuracy + global ECE/Brier vs a literal
    python recompute from the raw (m, y) pairs — exact equality (the
    statistics are single divisions of exact integer accumulators)."""
    from mpds_spark.queries import q_calibration_bins

    out = {r["bin"]: r for r in
           q_calibration_bins(spark, "/root/testdata/sf0.001").collect()}
    import duckdb

    rows = duckdb.sql(
        "SELECT least(n_chars, 400), CASE WHEN length(text) -"
        " length(replace(text, ' ', '')) + 1 >= 50 THEN 1 ELSE 0 END"
        " FROM '/root/testdata/sf0.001/documents.parquet'").fetchall()
    bins = {}
    for m, y in rows:
        b = min(9, m // 40)
        n, pos, sm, sm2, smy = bins.get(b, (0, 0, 0, 0, 0))
        bins[b] = (n + 1, pos + y, sm + m, sm2 + m * m, smy + m * y)
    N = sum(v[0] for v in bins.values())
    eceN = sum(abs(400 * v[1] - v[2]) for v in bins.values())
    brierN = sum(v[3] - 800 * v[4] + 160000 * v[1] for v in bins.values())
    assert set(out) == set(bins)
    for b, (n, pos, sm, _, _) in bins.items():
        r = out[b]
        assert (r["n_docs"], r["n_pos"]) == (n, pos)
        assert r["confidence"] == sm / (400 * n)
        assert r["accuracy"] == pos / n
        assert r["ece"] == eceN / (400 * N)
        assert r["brier"] == brierN / (160000 * N)
    # Brier decomposable sanity: 0 <= brier <= 1, 0 <= ece <= 1
    any_r = next(iter(out.values()))
    assert 0.0 <= any_r["ece"] <= 1.0 and 0.0 <= any_r["brier"] <= 1.0


def test_markov_accuracy_rebuild(spark):
    """Transition-table argmax accuracy vs a literal python rebuild of
    the per-user lead pairs (count desc, type asc tie-break)."""
    from mpds_spark.queries import q_markov_accuracy

    got = {r["cur_type"]: r for r in
           q_markov_accuracy(spark, "/root/testdata/sf0.001").collect()}
    import duckdb
    from collections import Counter, defaultdict

    rows = duckdb.sql(
        "SELECT user_id, epoch(ts), event_type FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " ORDER BY user_id, epoch(ts)").fetchall()
    seqs = defaultdict(list)
    for u, t, e in rows:
        seqs[u].append((t, e))
    trans = defaultdict(Counter)
    for u, evs in seqs.items():
        evs.sort()
        for (_, c), (_, nx) in zip(evs, evs[1:]):
            trans[c][nx] += 1
    assert set(got) == set(trans)
    for cur, cnt in trans.items():
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        r = got[cur]
        assert r["predicted_next"] == best[0]
        assert r["n_correct"] == best[1]
        assert r["n_pairs"] == sum(cnt.values())
        assert r["accuracy"] == best[1] / sum(cnt.values())


def test_kendall_tau_brute_force(spark):
    """tau-b / gamma vs the literal O(n^2) pair sweep in python —
    proving the contingency-table collapse (C/D as cell-pair sums,
    ties from marginals) against the definitional form."""
    from mpds_spark.queries import q_kendall_tau

    r = q_kendall_tau(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT least(9, CAST(n_chars AS BIGINT) // 40),"
        " least(9, CAST(length(text) - length(replace(text, ' ', ''))"
        " + 1 AS BIGINT) // 10)"
        " FROM '/root/testdata/sf0.001/documents.parquet'").fetchall()
    C = D = 0
    n = len(rows)
    for a in range(n):
        ia, ja = rows[a]
        for b in range(a + 1, n):
            ib, jb = rows[b]
            if ia == ib or ja == jb:
                continue
            if (ia < ib) == (ja < jb):
                C += 1
            else:
                D += 1
    from collections import Counter
    import math

    tx = sum(t * (t - 1) // 2 for t in Counter(i for i, _ in rows).values())
    ty = sum(t * (t - 1) // 2 for t in Counter(j for _, j in rows).values())
    n0 = n * (n - 1) // 2
    assert (r["n_docs"], r["concordant"], r["discordant"]) == (n, C, D)
    assert r["tau_b"] == (C - D) / (math.sqrt(n0 - tx) * math.sqrt(n0 - ty))
    assert r["gamma"] == (C - D) / (C + D)


def test_did_estimate_rebuild(spark):
    """4-cell DiD + pooled SE vs a literal python recompute (exact
    integer cell moments, same fixed expression tree)."""
    from mpds_spark.queries import q_did_estimate

    r = q_did_estimate(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb
    import hashlib
    import math

    rows = duckdb.sql(
        "SELECT user_id, day(ts), value FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type = 'purchase'").fetchall()
    cells = {}
    for u, mo, v in rows:
        tr = int(hashlib.md5(f"did|{u}".encode()).hexdigest()[:15], 16) % 2
        po = 1 if mo >= 16 else 0
        c = int(math.floor(abs(v) * 100 + 0.5)) * (1 if v >= 0 else -1)
        n, s, q = cells.get((tr, po), (0, 0, 0))
        cells[(tr, po)] = (n + 1, s + c, q + c * c)

    def m(tr, po):
        n, s, _ = cells[(tr, po)]
        return s / (100 * n)

    def vt(tr, po):
        n, s, q = cells[(tr, po)]
        return (q - s * s / n) / (n - 1.0) / n

    did = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
    se = math.sqrt(vt(0, 0) + vt(0, 1) + vt(1, 0) + vt(1, 1)) / 100.0
    assert r["n_purchases"] == sum(v[0] for v in cells.values())
    assert r["mean_ctrl_pre"] == m(0, 0) and r["mean_treat_post"] == m(1, 1)
    assert r["did"] == did and r["did_se"] == se
    assert r["t_stat"] == did / se


def test_perm_entropy_brute_force(spark):
    """Branch-free pattern code vs a literal stable argsort per triple,
    and the entropy vs a direct python recompute. Also pins the code
    <-> permutation bijection on all 6 orderings."""
    from mpds_spark.queries import q_perm_entropy

    def duck_round_py(v, digits=6):
        import math as _m
        pw = float(10 ** digits)
        return _m.copysign(_m.floor(abs(v) * pw + 0.5) / pw, v)

    got = {r["user_id"]: r for r in
           q_perm_entropy(spark, "/root/testdata/sf0.001").collect()}
    import duckdb
    import math
    from collections import Counter, defaultdict

    rows = duckdb.sql(
        "SELECT user_id, epoch(ts), event_id,"
        " CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " ORDER BY user_id, epoch(ts), event_id").fetchall()
    series = defaultdict(list)
    for u, t, e, c in rows:
        series[u].append(c)
    # code space: exactly 6 valid codes, one per permutation
    valid = set()
    import itertools
    for perm in itertools.permutations([10, 20, 30]):
        b01 = perm[0] <= perm[1]
        b02 = perm[0] <= perm[2]
        b12 = perm[1] <= perm[2]
        valid.add(4 * b01 + 2 * b02 + b12)
    assert len(valid) == 6
    for u, vs in series.items():
        cnt = Counter()
        for i in range(len(vs) - 2):
            a, b, c = vs[i], vs[i + 1], vs[i + 2]
            # stable ordinal pattern == the three stable comparisons
            code = 4 * (a <= b) + 2 * (a <= c) + (b <= c)
            # cross-check vs explicit stable argsort
            order = sorted(range(3), key=lambda k: ((a, b, c)[k], k))
            code2 = 4 * (order.index(0) < order.index(1)) \
                + 2 * (order.index(0) < order.index(2)) \
                + (order.index(1) < order.index(2))
            assert code == code2
            cnt[code] += 1
        n = sum(cnt.values())
        if n == 0:
            assert u not in got
            continue
        h = 0.0
        for k in sorted(cnt):
            h += (cnt[k] / n) * math.log(n / cnt[k])
        r = got[u]
        assert r["n_triples"] == n
        assert r["perm_entropy"] == duck_round_py(h / math.log(6.0), 6)
        assert 0.0 <= r["perm_entropy"] <= 1.0 + 1e-12


def test_theil_index_decomposition(spark):
    """Per-source T_g vs direct python; decomposition identity: sum of
    contributions == global Theil T computed from the pooled
    distribution (float tolerance only in the identity — the per-row
    values themselves are compared through the gate's duck_round)."""
    from mpds_spark.queries import q_theil_index

    out = {r["source"]: r for r in
           q_theil_index(spark, "/root/testdata/sf0.001").collect()}
    import duckdb
    import math
    from collections import defaultdict

    rows = duckdb.sql(
        "SELECT source, length(text) - length(replace(text, ' ', '')) + 1"
        " FROM '/root/testdata/sf0.001/documents.parquet'").fetchall()
    by = defaultdict(list)
    for s, w in rows:
        by[s].append(w)
    N = len(rows)
    X = sum(w for _, w in rows)
    total_contrib = 0.0
    for s, ws in by.items():
        n, x = len(ws), sum(ws)
        tg = sum(w * math.log(w) for w in sorted(ws)) / x - math.log(x / n)
        sg = x / X
        bt = sg * math.log((x / X) / (n / N))
        r = out[s]
        assert (r["n_docs"], r["sum_words"]) == (n, x)
        # outputs are _r6-rounded -> tolerance 1e-6
        assert abs(r["theil_within"] - tg) < 1e-6
        assert abs(r["between_term"] - bt) < 1e-6
        assert r["theil_within"] >= -1e-12  # T_g >= 0 always
        total_contrib += sg * tg + bt
    T = sum((w / X) * math.log((w / X) / (1.0 / N))
            for _, w in rows) / 1.0
    assert abs(total_contrib - T) < 1e-9


def test_anova_twoway_rebuild(spark):
    """SS decomposition vs direct python; identities: parts sum to
    total, eta^2 in [0,1], and SS_hour from the cell frame equals the
    one-way SS computed from raw rows."""
    from mpds_spark.queries import q_anova_twoway

    r = q_anova_twoway(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb
    import math
    from collections import defaultdict

    rows = duckdb.sql(
        "SELECT hour(ts), dayofweek(ts) + 1,"
        " CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type = 'purchase'").fetchall()
    cells = defaultdict(lambda: [0, 0, 0])
    for h, d, c in rows:
        e = cells[(h, d)]
        e[0] += 1
        e[1] += c
        e[2] += c * c
    nn = sum(v[0] for v in cells.values())
    ss = sum(v[1] for v in cells.values())
    qq = sum(v[2] for v in cells.values())
    cm = ss * ss / nn

    def marg(idx):
        m = defaultdict(lambda: [0, 0])
        for k, v in cells.items():
            m[k[idx]][0] += v[0]
            m[k[idx]][1] += v[1]
        return sum(s * s / n for k, (n, s) in sorted(m.items())) - cm

    sst = qq - cm
    ssc = sum(v[1] * v[1] / v[0] for k, v in sorted(cells.items())) - cm
    ssh, ssd = marg(0), marg(1)
    assert r["n_purchases"] == nn
    assert abs(r["ss_total"] - sst / 1e4) < 1e-6 * max(1, abs(sst / 1e4))
    assert abs(r["ss_hour"] - ssh / 1e4) < 1e-6 * max(1, abs(ssh / 1e4))
    assert abs(r["ss_dow"] - ssd / 1e4) < 1e-6 * max(1, abs(ssd / 1e4))
    # decomposition identity
    assert abs(
        (r["ss_hour"] + r["ss_dow"] + r["ss_interaction"]
         + r["ss_within"]) - r["ss_total"]
    ) < 1e-6 * max(1.0, r["ss_total"])
    assert 0.0 <= r["eta2_hour"] <= 1.0 and 0.0 <= r["eta2_dow"] <= 1.0


def test_hurst_variance_plot_rebuild(spark):
    """Block roll-up + 4-point LS slope vs direct python on the same
    per-user ordered series; white-noise sanity: iid-ish values give
    H below ~0.75 (no long-range dependence planted)."""
    from mpds_spark.queries import q_hurst_variance_plot

    r = q_hurst_variance_plot(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb
    import math
    from collections import defaultdict

    rows = duckdb.sql(
        "SELECT user_id, epoch(ts), event_id,"
        " CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " ORDER BY user_id, epoch(ts), event_id").fetchall()
    series = defaultdict(list)
    for u, t, e, c in rows:
        series[u].append(c)
    vs = {}
    for m in (1, 2, 4, 8):
        b = tt = uu = 0
        for u, xs in series.items():
            nb = len(xs) // m
            for i in range(nb):
                s = sum(xs[i * m:(i + 1) * m])
                b += 1
                tt += s
                uu += s * s
        vs[m] = (uu / (m * m) - (tt / m) * (tt / m) / b) / (b - 1)
    lv = {m: math.log2(vs[m]) for m in vs}
    ybar = sum(lv.values()) / 4.0
    slope = sum(
        (lv[m] - ybar) * (x - 1.5)
        for m, x in zip((1, 2, 4, 8), (0.0, 1.0, 2.0, 3.0))
    ) / 5.0
    assert abs(r["var_m1"] - vs[1] / 1e4) < 1e-5
    assert abs(r["var_m8"] - vs[8] / 1e4) < 1e-5
    assert abs(r["slope"] - slope) < 1e-5
    assert abs(r["hurst"] - (1.0 + slope / 2.0)) < 1e-5
    assert r["hurst"] < 0.75


def test_logrank_rebuild(spark):
    """O-E / variance / chi2 vs a literal python sweep over the gap
    curve (same bins, same censoring), plus a planted two-arm check
    where one arm's gaps are doubled -> chi2 must be large."""
    from mpds_spark.queries import q_logrank_test

    r = q_logrank_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb
    import hashlib
    from collections import defaultdict

    rows = duckdb.sql(
        "SELECT user_id, epoch(ts), event_id FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type = 'purchase'"
        " ORDER BY user_id, epoch(ts), event_id").fetchall()
    mx = duckdb.sql(
        "SELECT max(epoch(ts)) FROM"
        " '/root/testdata/sf0.001/events.parquet'").fetchone()[0]
    seqs = defaultdict(list)
    for u, t, e in rows:
        seqs[u].append(t)
    curve = defaultdict(lambda: [0, 0, 0, 0])  # d1, c1, d0, c0
    for u, ts in seqs.items():
        arm = int(hashlib.md5(f"lr|{u}".encode()).hexdigest()[:15],
                  16) % 2
        for i, t in enumerate(ts):
            nxt = ts[i + 1] if i + 1 < len(ts) else None
            gap = (nxt if nxt is not None else mx) - t
            day = int(gap // 3600)
            obs = 1 if nxt is not None else 0
            e = curve[day]
            if arm == 1:
                e[0] += obs
                e[1] += 1 - obs
            else:
                e[2] += obs
                e[3] += 1 - obs
    days = sorted(curve)
    total1 = sum(curve[d][0] + curve[d][1] for d in days)
    totalt = total1 + sum(curve[d][2] + curve[d][3] for d in days)
    oe = vv = 0.0
    rem1, remt = total1, totalt
    obs1 = obs0 = 0
    for d in days:
        d1, c1, d0, c0 = curve[d]
        dt = d1 + d0
        obs1 += d1
        obs0 += d0
        if dt > 0:
            oe += d1 - dt * rem1 / remt
            if remt > 1:
                vv += (dt * (rem1 / remt) * ((remt - rem1) / remt)
                       * ((remt - dt) / (remt - 1)))
        rem1 -= d1 + c1
        remt -= d1 + c1 + d0 + c0
    assert (r["obs_deaths_arm1"], r["obs_deaths_arm0"]) == (obs1, obs0)
    assert abs(r["o_minus_e"] - oe) < 1e-5
    assert abs(r["variance"] - vv) < 1e-5
    assert abs(r["chi2"] - oe * oe / vv) < 1e-5


def test_segmented_trend_rebuild(spark):
    """Breakpoint argmin vs a literal per-candidate python OLS sweep,
    and the decomposition sanity sse_two_piece <= sse_single_line."""
    from mpds_spark.queries import q_segmented_trend

    r = q_segmented_trend(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(day(ts) AS BIGINT), CAST(count(*) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1 ORDER BY 1").fetchall()

    def ols_sse(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        sxx_c = sxx - sx * sx / n
        sxy_c = sxy - sx * sy / n
        syy_c = syy - sy * sy / n
        return syy_c - sxy_c * sxy_c / sxx_c, sxy_c / sxx_c

    best = None
    for bi in range(len(rows)):
        left = rows[: bi + 1]
        right = rows[bi + 1:]
        if len(left) < 3 or len(right) < 3:
            continue
        sl, bl = ols_sse(left)
        sr, br = ols_sse(right)
        key = (sl + sr, rows[bi][0])
        if best is None or key < best[0]:
            best = (key, bl, br)
    (sse, b), bl, br = best
    assert r["break_day"] == b
    assert abs(r["slope_left"] - bl) < 1e-5
    assert abs(r["slope_right"] - br) < 1e-5
    assert r["sse_two_piece"] <= r["sse_single_line"] + 1e-9
    assert 0.0 <= r["sse_reduction"] <= 1.0


def test_mann_kendall_brute_force(spark):
    """S / tie-corrected variance / continuity-corrected z vs the
    literal O(n^2) pairwise definition in python over the same daily
    counts (Mann 1945 eq. for S; Kendall 1975 tie variance)."""
    from mpds_spark.queries import q_mann_kendall

    r = q_mann_kendall(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        y
        for (y,) in duckdb.sql(
            "SELECT CAST(count(*) AS BIGINT) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z = (s - 1) / var**0.5 if s > 0 else ((s + 1) / var**0.5 if s < 0 else 0.0)
    assert (r["n_days"], r["s_stat"], r["tie_term"]) == (n, s, tie)
    assert abs(r["var_s"] - var) < 1e-5
    assert abs(r["z_score"] - z) < 1e-5
    assert r["trend"] == (
        "increasing" if s > 0 else "decreasing" if s < 0 else "no_trend"
    )


def test_runs_test_rebuild(spark):
    """Runs count / moments / z vs a literal python rebuild (Wald &
    Wolfowitz 1940), including the drop-equal-to-median treatment and
    the doubled-median integer classification."""
    from mpds_spark.queries import q_runs_test

    r = q_runs_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(day(ts) AS BIGINT), CAST(count(*) AS BIGINT) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ys = [y for _, y in rows]
    srt = sorted(ys)
    n = len(srt)
    med2 = srt[(n + 1) // 2 - 1] + srt[n // 2]
    signs = [1 if 2 * y > med2 else 0 for y in ys if 2 * y != med2]
    runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    nk, n1 = len(signs), sum(signs)
    n2 = nk - n1
    e = 1.0 + 2 * n1 * n2 / nk
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - nk) / (nk * nk * (nk - 1))
    )
    z = (runs - e) / var**0.5 if var > 0 else 0.0
    assert (r["n_kept"], r["n_above"], r["n_below"], r["runs"]) == (
        nk, n1, n2, runs,
    )
    assert abs(r["expected_runs"] - e) < 1e-5
    assert abs(r["var_runs"] - var) < 1e-5
    assert abs(r["z_score"] - z) < 1e-5


def test_bpe_merge_step_greedy_rebuild(spark):
    """Top pair + greedy left-to-right merge count vs a literal python
    BPE application over every document (including the A==B run case
    the gaps-and-islands formula must get right)."""
    from mpds_spark.queries import q_bpe_merge_step

    r = q_bpe_merge_step(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb
    from collections import Counter

    texts = [
        t
        for (t,) in duckdb.sql(
            "SELECT text FROM"
            " '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    ]
    cnt = Counter()
    tokens_before = 0
    for t in texts:
        w = t.split(" ")
        tokens_before += len(w)
        cnt.update(zip(w, w[1:]))
    (tw1, tw2), pc = min(
        cnt.items(), key=lambda kv: (-kv[1], kv[0])
    )
    applied = 0
    for t in texts:
        w = t.split(" ")
        i = 0
        while i < len(w) - 1:
            if w[i] == tw1 and w[i + 1] == tw2:
                applied += 1
                i += 2
            else:
                i += 1
    assert (r["pair_left"], r["pair_right"], r["pair_count"]) == (
        tw1, tw2, pc,
    )
    assert r["merges_applied"] == applied
    assert r["tokens_before"] == tokens_before
    assert r["tokens_after"] == tokens_before - applied


def test_bpe_merge_step_equal_pair_runs(spark):
    """The A==B branch: plant run lengths 1..5 of the winning token and
    check floor(L/2) greedy counting survives the islands formula."""
    from mpds_spark.queries import q_bpe_merge_step
    import os
    import tempfile

    rows = [
        ("d1", "a a a a a"),       # run 5 -> 2 merges
        ("d2", "a a x a a a"),     # runs 2,3 -> 1 + 1
        ("d3", "x a x"),           # run 1 -> 0
        ("d4", "a a"),             # run 2 -> 1
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id string, text string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        r = q_bpe_merge_step(spark, td).collect()[0]
    assert (r["pair_left"], r["pair_right"]) == ("a", "a")
    # adjacent (a,a) pairs: 4 + (1 + 2) + 0 + 1 = 8
    assert r["pair_count"] == 8
    # greedy merges: 2 + (1 + 1) + 0 + 1 = 5
    assert r["merges_applied"] == 5
    assert r["tokens_after"] == r["tokens_before"] - 5


def test_padding_waste_audit_brute_force(spark):
    """Both strategies vs a literal python batching loop; and the
    length-sorted strategy must never waste more than arrival order
    within any source (sorting minimizes sum of batch maxima for
    consecutive grouping)."""
    from mpds_spark.queries import q_padding_waste_audit

    out = {
        (r["strategy"], r["source"]): r
        for r in q_padding_waste_audit(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb
    from collections import defaultdict

    rows = duckdb.sql(
        "SELECT doc_id, source, len(string_split(text, ' ')) FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for doc_id, src, l in rows:
        by_src[src].append((doc_id, l))
    for src, docs in by_src.items():
        for strat, key in (
            ("arrival", lambda d: d[0]),
            ("length_sorted", lambda d: (d[1], d[0])),
        ):
            ordered = [l for _, l in sorted(
                docs, key=lambda d: key(d) if strat == "arrival"
                else (d[1], d[0])
            )] if strat == "length_sorted" else [
                l for _, l in sorted(docs)
            ]
            batches = [
                ordered[i:i + 8] for i in range(0, len(ordered), 8)
            ]
            real = sum(ordered)
            padded = sum(len(b) * max(b) for b in batches)
            r = out[(strat, src)]
            assert r["n_batches"] == len(batches)
            assert r["real_tokens"] == real
            assert r["padded_tokens"] == padded
        assert (
            out[("length_sorted", src)]["padded_tokens"]
            <= out[("arrival", src)]["padded_tokens"]
        )


def test_bh_fdr_stepup_rebuild(spark):
    """Chi-square statistics, deterministic critical values, and the
    step-up k vs a literal python rebuild (Benjamini & Hochberg 1995);
    also pins the bisection helper against math.erfc round-trips."""
    import math

    from mpds_spark.queries import _BH_CRITS, _chi2_inv_1dof, q_bh_fdr

    # the bisection inverts erfc: erfc(sqrt(chi2)/sqrt(2)) == target
    for i, c in enumerate(_BH_CRITS, start=1):
        assert abs(
            math.erfc(math.sqrt(c) / math.sqrt(2.0)) - i * 0.05 / 24
        ) < 1e-12
    assert _chi2_inv_1dof(0.05) == _BH_CRITS[-1]

    rows = {
        r["hour"]: r
        for r in q_bh_fdr(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    cells = duckdb.sql(
        "SELECT CAST(hour(ts) AS BIGINT), CAST(count(*) AS BIGINT),"
        " CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        " AS BIGINT) FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    N = sum(n for _, n, _ in cells)
    X = sum(x for _, _, x in cells)
    stats = []
    for h, n, x in cells:
        num = x - n * X / N
        chi2 = num * num / (n * (X / N) * (1 - X / N))
        stats.append((h, chi2))
    ranked = sorted(stats, key=lambda t: (-t[1], t[0]))
    kmax = 0
    for i, (h, chi2) in enumerate(ranked, start=1):
        if chi2 >= _BH_CRITS[i - 1]:
            kmax = i
    for i, (h, chi2) in enumerate(ranked, start=1):
        r = rows[h]
        assert r["rank"] == i
        assert abs(r["chi2"] - chi2) < 1e-4
        assert r["rejected"] == (i <= kmax)


def test_eb_shrinkage_mom_rebuild(spark):
    """alpha/beta and the shrunk rates vs a literal python
    method-of-moments rebuild over the same per-user cells, and the
    shrinkage direction invariant: every shrunk rate lies between the
    raw rate and the prior mean."""
    from mpds_spark.queries import q_eb_shrinkage

    out = q_eb_shrinkage(spark, "/root/testdata/sf0.001").collect()
    import duckdb

    cells = duckdb.sql(
        "SELECT x, n, CAST(count(*) AS BIGINT) FROM ("
        " SELECT user_id, CAST(count(*) AS BIGINT) AS n,"
        " CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS x"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1)"
        " WHERE n >= 5 GROUP BY x, n ORDER BY n, x"
    ).fetchall()
    uu = sum(c for _, _, c in cells)
    sr = 0.0
    sr2 = 0.0
    for x, n, c in cells:
        sr += c * (x / n)
        sr2 += c * (x / n) * (x / n)
    m = sr / uu
    v = (sr2 - sr * sr / uu) / (uu - 1)
    s = m * (1.0 - m) / v - 1.0
    alpha, beta = m * s, (1.0 - m) * s
    assert s > 0, "testdata must be overdispersed for EB to apply"
    prior_mean = alpha / (alpha + beta)
    for r in out:
        assert abs(r["alpha"] - alpha) < 1e-5
        assert abs(r["beta"] - beta) < 1e-5
        want = (r["purchases"] + alpha) / (
            r["n_events"] + alpha + beta
        )
        assert abs(r["shrunk_rate"] - want) < 1e-5
        lo = min(r["raw_rate"], prior_mean) - 1e-6
        hi = max(r["raw_rate"], prior_mean) + 1e-6
        assert lo <= r["shrunk_rate"] <= hi


def test_kneser_ney_vs_literal_model(spark):
    """KN probabilities vs a literal python Kneser-Ney bigram model
    (Chen & Goodman 1998 interpolated form, D=0.75) on every doc, and
    the probability-simplex sanity: for a planted context the KN
    distribution over continuations sums to 1."""
    from mpds_spark.queries import q_kneser_ney_nll

    out = {
        r["doc_id"]: r
        for r in q_kneser_ney_nll(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import math

    import duckdb
    from collections import Counter, defaultdict

    texts = duckdb.sql(
        "SELECT doc_id, text FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    c12 = Counter()
    for _, t in texts:
        w = t.split()
        c12.update(zip(w, w[1:]))
    c1 = defaultdict(int)
    n1fw = defaultdict(int)
    n1bw = defaultdict(int)
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    T = len(c12)
    D = 0.75

    def p(w1, w2):
        return max(c12[(w1, w2)] - D, 0.0) / c1[w1] + (
            D * n1fw[w1] / c1[w1]
        ) * (n1bw[w2] / T)

    # simplex check over every observed continuation of one context
    # plus the continuation mass it spreads over unseen words: for
    # corpus-trained KN the observed continuations alone carry
    # sum(max(c-D,0))/c1 + D*n1fw/c1 * sum(n1bw(w2) for seen w2)/T
    w1 = max(c1, key=lambda k: (c1[k], k))
    seen = [w2 for (a, w2) in c12 if a == w1]
    mass = sum(p(w1, w2) for w2 in seen)
    full = sum(
        (D * n1fw[w1] / c1[w1]) * (n1bw[w2] / T)
        for w2 in set(n1bw) - set(seen)
    )
    assert abs(mass + full - 1.0) < 1e-9

    for doc_id, t in texts:
        w = t.split()
        if len(w) < 2:
            assert doc_id not in out
            continue
        nll = [-math.log(p(a, b)) for a, b in zip(w, w[1:])]
        r = out[doc_id]
        assert r["n_bigrams"] == len(nll)
        assert abs(r["kn_nll"] - sum(nll) / len(nll)) < 1e-5


def test_levene_brown_forsythe_rebuild(spark):
    """F statistic vs a literal python Brown-Forsythe computation
    (median-centered absolute deviations, one-way ANOVA on them),
    including the doubled-median integer trick's scale cancellation."""
    from mpds_spark.queries import q_levene_test

    r = q_levene_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb
    from collections import defaultdict

    rows = duckdb.sql(
        "SELECT event_type,"
        " CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    by_g = defaultdict(list)
    for g, c in rows:
        by_g[g].append(c)
    zs = {}
    for g, cs in by_g.items():
        srt = sorted(cs)
        n = len(srt)
        med2 = srt[(n + 1) // 2 - 1] + srt[n // 2]
        zs[g] = [abs(2 * c - med2) for c in cs]
    k = len(zs)
    N = sum(len(v) for v in zs.values())
    St = sum(sum(v) for v in zs.values())
    Qt = sum(z * z for v in zs.values() for z in v)
    sb = sum(sum(v) ** 2 / len(v) for g, v in sorted(zs.items()))
    B = sb - St * St / N
    W = Qt - sb
    f = (B / (k - 1)) / (W / (N - k))
    assert (r["k_groups"], r["n_total"]) == (k, N)
    assert (r["df1"], r["df2"]) == (k - 1, N - k)
    assert abs(r["f_stat"] - f) < 1e-4
    assert abs(r["between_ms"] - B / (k - 1)) < 1e-2
    assert abs(r["within_ms"] - W / (N - k)) < 1e-2


def test_cochran_armitage_rebuild(spark):
    """T numerator and z^2 vs the literal Cochran-Armitage definition
    T = sum s_i (x_i - n_i X/N) computed in python over the same day
    cells (Armitage 1955 eq. 2-3)."""
    from mpds_spark.queries import q_cochran_armitage

    r = q_cochran_armitage(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    cells = duckdb.sql(
        "SELECT CAST(day(ts) AS BIGINT), CAST(count(*) AS BIGINT),"
        " CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        " AS BIGINT) FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1"
    ).fetchall()
    N = sum(n for _, n, _ in cells)
    X = sum(x for _, _, x in cells)
    t = sum(s * (x - n * X / N) for s, n, x in cells)
    t_num = N * sum(s * x for s, _, x in cells) - X * sum(
        s * n for s, n, _ in cells
    )
    assert abs(t_num / N - t) < 1e-6
    var = (X / N) * (1 - X / N) * (
        sum(s * s * n for s, n, _ in cells)
        - sum(s * n for s, n, _ in cells) ** 2 / N
    )
    z2 = (t_num / N) ** 2 / var
    assert r["t_num"] == t_num
    assert (r["n_events"], r["n_pos"], r["n_levels"]) == (
        N, X, len(cells),
    )
    assert abs(r["z2"] - z2) < 1e-4
    assert r["trend"] == (
        "increasing" if t_num > 0
        else "decreasing" if t_num < 0 else "no_trend"
    )


def _pava(ns, xs):
    """Classic stack-based pool-adjacent-violators (weighted means)."""
    blocks = []  # (weight, sum, span)
    for n, x in zip(ns, xs):
        blocks.append([n, x, 1])
        while len(blocks) > 1 and (
            blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
        ):
            w2, s2, c2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
            blocks[-1][2] += c2
    out = []
    for w, s, c in blocks:
        out.extend([s / w] * c)
    return out


def test_isotonic_minimax_equals_pava(spark):
    """The minimax identity must reproduce classic stack-based PAVA on
    the real bin frame AND on planted violator patterns; the fitted
    curve must be monotone and weight-mean-preserving."""
    from mpds_spark.queries import q_isotonic_calibration

    rows = sorted(
        q_isotonic_calibration(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["bin"],
    )
    ns = [r["n_docs"] for r in rows]
    xs = [r["n_pos"] for r in rows]
    want = _pava(ns, xs)
    for r, w in zip(rows, want):
        assert abs(r["iso_rate"] - w) < 1e-6
    for a, b in zip(rows, rows[1:]):
        assert a["iso_rate"] <= b["iso_rate"] + 1e-12
    assert abs(
        sum(r["iso_rate"] * r["n_docs"] for r in rows)
        - sum(xs)
    ) < 1e-3

    # planted violators: strictly decreasing rates pool into one block
    ns2, xs2 = [10, 10, 10], [9, 5, 1]
    assert _pava(ns2, xs2) == [0.5, 0.5, 0.5]


def test_gumbel_maxima_formula(spark):
    """MoM fit vs a literal python computation over the same daily
    maxima, and the quantile sanity F(rl_T) = 1 - 1/T under the fitted
    Gumbel CDF exp(-exp(-(x-mu)/beta))."""
    from mpds_spark.queries import q_gumbel_maxima

    r = q_gumbel_maxima(spark, "/root/testdata/sf0.001").collect()[0]
    import math

    import duckdb

    ms = [
        m
        for (m,) in duckdb.sql(
            "SELECT CAST(max(CAST(floor(abs(value)*100+0.5)*sign(value)"
            " AS BIGINT)) AS BIGINT) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " WHERE event_type='purchase' GROUP BY day(ts)"
        ).fetchall()
    ]
    n = len(ms)
    mean = sum(ms) / n / 100.0
    std = (
        (sum(m * m for m in ms) - sum(ms) ** 2 / n) / (n - 1)
    ) ** 0.5 / 100.0
    beta = std * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    assert r["n_days"] == n
    assert abs(r["mean_daily_max"] - mean) < 1e-4
    assert abs(r["gumbel_mu"] - mu) < 1e-4
    assert abs(r["gumbel_beta"] - beta) < 1e-4
    for T, col in ((7, "return_level_7d"), (30, "return_level_30d")):
        want = mu - beta * math.log(-math.log(1.0 - 1.0 / T))
        assert abs(r[col] - want) < 1e-4
        cdf = math.exp(-math.exp(-(r[col] - mu) / beta))
        assert abs(cdf - (1.0 - 1.0 / T)) < 1e-6
    assert r["return_level_30d"] > r["return_level_7d"]


def test_session_edit_distance_brute_force(spark):
    """Histogram vs a literal python DP-Levenshtein over the same
    per-user-day initials strings."""
    from mpds_spark.queries import q_session_edit_distance

    got = {
        r["edit_distance"]: r["n_pairs"]
        for r in q_session_edit_distance(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb
    from collections import Counter, defaultdict

    rows = duckdb.sql(
        "SELECT user_id, CAST(day(ts) AS BIGINT), ts, event_type FROM"
        " '/root/testdata/sf0.001/events.parquet' ORDER BY user_id, ts"
    ).fetchall()
    days = defaultdict(str)
    for u, d, _, et in rows:
        days[(u, d)] += et[0]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(
                    prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                ))
            prev = cur
        return prev[-1]

    by_user = defaultdict(list)
    for (u, d), s in sorted(days.items()):
        by_user[u].append((d, s))
    want = Counter()
    for u, lst in by_user.items():
        lst.sort()
        for (_, a), (_, b) in zip(lst, lst[1:]):
            want[lev(a, b)] += 1
    assert got == dict(want)


def test_bradley_terry_mm_rebuild(spark):
    """Strengths vs a literal python MM rebuild (Hunter 2004, 10
    iterations, same op order), the simplex invariant sum p = 1, and
    the fixed-point residual shrinking vs the uniform start."""
    from mpds_spark.queries import _BT_R, _BT_TYPES, q_bradley_terry

    rows = {
        r["event_type"]: r
        for r in q_bradley_terry(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    K = len(_BT_TYPES)
    cases = ", ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS c{i}"
        for i, t in enumerate(_BT_TYPES)
    )
    users = duckdb.sql(
        f"SELECT {cases} FROM"
        " '/root/testdata/sf0.001/events.parquet' GROUP BY user_id"
    ).fetchall()
    w = [[0] * K for _ in range(K)]
    for cs in users:
        for i in range(K):
            for j in range(K):
                if i != j and cs[i] > cs[j]:
                    w[i][j] += 1
    n = [[w[i][j] + w[j][i] for j in range(K)] for i in range(K)]
    bw = [sum(w[i][j] for j in range(K) if j != i) for i in range(K)]
    p = [0.2] * K
    for _ in range(_BT_R):
        q = []
        for i in range(K):
            den = 0.0
            for j in range(K):
                if j != i:
                    den += n[i][j] / (p[i] + p[j])
            q.append(bw[i] / den)
        s = sum(q)
        p = [qi / s for qi in q]
    for i, t in enumerate(_BT_TYPES):
        r = rows[t]
        assert r["wins"] == bw[i]
        assert r["losses"] == sum(w[j][i] for j in range(K) if j != i)
        assert abs(r["bt_strength"] - p[i]) < 1e-6
    assert abs(sum(r["bt_strength"] for r in rows.values()) - 1.0) < 1e-5
    # MM is monotone in likelihood: the fitted point must satisfy the
    # fixed-point equation better than the uniform start
    def resid(pv):
        tot = 0.0
        for i in range(K):
            den = sum(
                n[i][j] / (pv[i] + pv[j]) for j in range(K) if j != i
            )
            tot += abs(pv[i] - bw[i] / den / sum(
                bw[k] / sum(
                    n[k][j] / (pv[k] + pv[j]) for j in range(K) if j != k
                ) for k in range(K)
            ))
        return tot

    assert resid(p) < resid([0.2] * K)


def test_pca_power_iter_rebuild_and_bounds(spark):
    """Loadings/eigenvalue vs a literal python rebuild of the SAME 8
    power-iteration steps (identical op order), plus the spectral
    bounds: the Rayleigh quotient after R steps is monotone in R,
    lies in [mean eigenvalue, lambda_max], and the loading vector is
    unit norm. On this near-isotropic random cloud 8 steps do NOT
    converge to the eigh top vector — small explained_share + slow
    convergence IS the audit's no-dominant-direction signal; the
    planted-anisotropy test below covers the converging regime."""
    from mpds_spark.queries import _PCA_D, _PCA_R, q_pca_power_iter

    rows = sorted(
        q_pca_power_iter(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["component"],
    )
    import duckdb
    import numpy as np

    vecs = duckdb.sql(
        "SELECT list_transform(embedding, x ->"
        " CAST(floor(abs(CAST(x AS DOUBLE))*1000 + 0.5)"
        " * sign(CAST(x AS DOUBLE)) AS BIGINT)) FROM"
        " '/root/testdata/sf0.001/embeddings.parquet'"
    ).fetchall()
    D = _PCA_D
    X = [v[0] for v in vecs]
    n = len(X)
    S = [[0] * D for _ in range(D)]
    ssum = [0] * D
    for q in X:
        for i in range(D):
            ssum[i] += q[i]
            for j in range(i, D):
                S[i][j] += q[i] * q[j]
    for i in range(D):
        for j in range(i):
            S[i][j] = S[j][i]
    C = [
        [(S[i][j] - ssum[i] * ssum[j] / n) / (n - 1) for j in range(D)]
        for i in range(D)
    ]

    def mv(v):
        return [
            sum(C[i][j] * v[j] for j in range(D)) for i in range(D)
        ]

    v = [1.0 / D ** 0.5] * D
    lams = []
    for _ in range(_PCA_R):
        u = mv(v)
        m = sum(e * e for e in u) ** 0.5
        v = [e / m for e in u]
        lams.append(sum(a * b for a, b in zip(v, mv(v))))
    uf = mv(v)
    lam = sum(a * b for a, b in zip(v, uf))
    mf = sum(e * e for e in uf) ** 0.5
    loadings = [e / mf for e in uf]
    for r, w in zip(rows, loadings):
        assert abs(r["loading"] - w) < 1e-6
    assert abs(rows[0]["eigenvalue"] - lam) < 1e-4

    Cn = np.array(C)
    evals = np.linalg.eigvalsh(Cn)
    assert lams == sorted(lams), "Rayleigh quotient must be monotone"
    assert lam <= evals[-1] + 1e-6
    assert lam >= float(np.trace(Cn)) / D - 1e-6
    assert abs(np.linalg.norm(np.array(loadings)) - 1.0) < 1e-9
    assert abs(
        rows[0]["explained_share"] - lam / float(np.trace(Cn))
    ) < 1e-4


def test_pca_power_iter_planted_direction(spark):
    """On a planted-anisotropy cloud (one dominant axis, eigengap
    large) 8 power iterations DO converge: |cos| vs the numpy eigh
    top eigenvector > 0.999 and explained_share is large."""
    import os
    import tempfile

    import numpy as np

    from mpds_spark.queries import q_pca_power_iter

    rng = np.random.default_rng(7)
    d, n = 64, 120
    axis = rng.standard_normal(d)
    axis /= np.linalg.norm(axis)
    X = (
        np.outer(rng.standard_normal(n) * 0.5, axis)
        + rng.standard_normal((n, d)) * 0.02
    ).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(X)],
            "vec_id long, embedding array<float>",
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        rows = sorted(
            q_pca_power_iter(spark, td).collect(),
            key=lambda r: r["component"],
        )
    Q = np.floor(np.abs(X.astype(np.float64)) * 1000 + 0.5) * np.sign(X)
    C = np.cov(Q, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(C)
    v = np.array([r["loading"] for r in rows])
    assert abs(abs(float(np.dot(v, evecs[:, -1]))) - 1.0) < 1e-3
    assert rows[0]["explained_share"] > 0.8
    assert abs(rows[0]["eigenvalue"] - evals[-1]) / evals[-1] < 1e-3


def test_ransac_trend_exhaustive_rebuild(spark):
    """Winning candidate, inlier count and the exact-integer OLS refit
    vs a literal python sweep of every two-day line (Fischler & Bolles
    1981 consensus rule, 10%-of-mean tolerance)."""
    from mpds_spark.queries import q_ransac_trend

    r = q_ransac_trend(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(day(ts) AS BIGINT), CAST(count(*) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    tol = 0.1 * (sum(y for _, y in rows) / len(rows))
    best = None
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            x1, y1 = rows[i]
            x2, y2 = rows[j]
            sl = (y2 - y1) / (x2 - x1)
            inl = [
                (x, y) for x, y in rows
                if abs(y - (y1 + sl * (x - x1))) <= tol
            ]
            key = (-len(inl), x1, x2)
            if best is None or key < best[0]:
                best = (key, inl)
    (ninl_neg, bx1, bx2), inliers = best
    assert (r["anchor_day1"], r["anchor_day2"]) == (bx1, bx2)
    assert r["n_inliers"] == -ninl_neg == len(inliers)
    n = len(inliers)
    sx = sum(x for x, _ in inliers)
    sy = sum(y for _, y in inliers)
    sxy = sum(x * y for x, y in inliers)
    sxx = sum(x * x for x, _ in inliers)
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert abs(r["slope_refit"] - slope) < 1e-5
    assert abs(
        r["intercept_refit"] - (sy / n - slope * (sx / n))
    ) < 1e-4


def test_dft_periodogram_rebuild(spark):
    """Power shares vs a literal python DFT over the same detrended
    daily series (identical fold order, libm cos/sin), plus the
    Parseval-flavored sanity that shares sum to 1."""
    from mpds_spark.queries import q_dft_periodogram

    rows = sorted(
        q_dft_periodogram(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["k"],
    )
    import math

    import duckdb

    ys = [
        y
        for (y,) in duckdb.sql(
            "SELECT CAST(count(*) AS BIGINT) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    s = sum(ys)
    powers = []
    for k in range(1, 9):
        c = 0.0
        sn = 0.0
        for t in range(1, n + 1):
            ang = 6.283185307179586 * k * t / n
            c += (n * ys[t - 1] - s) * math.cos(ang)
            sn += (n * ys[t - 1] - s) * math.sin(ang)
        powers.append(c * c + sn * sn)
    tot = sum(powers)
    for r, p in zip(rows, powers):
        assert abs(r["power_share"] - p / tot) < 1e-6
    assert abs(sum(r["power_share"] for r in rows) - 1.0) < 1e-6


def test_sprt_monitor_rebuild(spark):
    """Cumulative LLR vs a literal python Wald SPRT replay with the
    same pinned literals, plus the A/A-null expectation that the
    final-day LLR corresponds to the pooled rate (the boundary
    decision recomputed identically)."""
    from mpds_spark.queries import (
        _SPRT_LN19, _SPRT_LN_LIFT, q_sprt_monitor,
    )

    rows = {
        r["day"]: r
        for r in q_sprt_monitor(spark, "/root/testdata/sf0.001").collect()
    }
    import math

    import duckdb

    cells = duckdb.sql(
        "SELECT CAST(day(ts) AS BIGINT), CAST(count(*) AS BIGINT),"
        " CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        " AS BIGINT) FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    N = sum(n for _, n, _ in cells)
    X = sum(x for _, _, x in cells)
    p0 = X / N
    l0 = math.log((1.0 - 1.1 * p0) / (1.0 - p0))
    cn = cx = 0
    for d, n, x in cells:
        cn += n
        cx += x
        llr = cx * _SPRT_LN_LIFT + (cn - cx) * l0
        r = rows[d]
        assert (r["cum_events"], r["cum_purchases"]) == (cn, cx)
        assert abs(r["llr"] - llr) < 1e-5
        want = (
            "accept_h1" if llr >= _SPRT_LN19
            else "accept_h0" if llr <= -_SPRT_LN19 else "continue"
        )
        assert r["decision"] == want


def test_sinkhorn_ot_rebuild_and_marginals(spark):
    """OT cost vs a literal python Sinkhorn rebuild (same kernel
    literals, same fold order), the marginal-residual convergence
    certificate, and the transport-plan mass balance."""
    from mpds_spark.queries import _SK_K, _SK_R, q_sinkhorn_ot

    r = q_sinkhorn_ot(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "WITH e AS (SELECT event_type AS t,"
        " CAST(floor(abs(value)*100+0.5)*sign(value) AS BIGINT) AS c"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type IN ('purchase','click')),"
        " mx AS (SELECT max(c) AS mx FROM e)"
        " SELECT t, CAST(c // (mx // 10 + 1) AS BIGINT) AS b,"
        " count(*) FROM e, mx GROUP BY 1, 2"
    ).fetchall()
    pa = [0] * 10
    pb = [0] * 10
    for t, b, c in rows:
        (pa if t == "purchase" else pb)[b] += c
    a = [x / sum(pa) for x in pa]
    b = [x / sum(pb) for x in pb]
    K = [[_SK_K[abs(i - j)] for j in range(10)] for i in range(10)]
    v = [1.0] * 10
    for _ in range(_SK_R):
        u = [
            a[i] / sum(K[i][j] * v[j] for j in range(10))
            if a[i] else 0.0
            for i in range(10)
        ]
        v = [
            b[j] / sum(K[i][j] * u[i] for i in range(10))
            if b[j] else 0.0
            for j in range(10)
        ]
    P = [[u[i] * K[i][j] * v[j] for j in range(10)] for i in range(10)]
    cost = sum(
        P[i][j] * abs(i - j) for i in range(10) for j in range(10)
    )
    assert r["iterations"] == _SK_R
    assert abs(r["ot_cost"] - cost) < 1e-5
    # column marginals exact after the final v update; row residual
    # small and equal to the reported certificate
    for j in range(10):
        colsum = sum(P[i][j] for i in range(10))
        assert abs(colsum - b[j]) < 1e-9
    resid = sum(
        abs(sum(P[i][j] for j in range(10)) - a[i]) for i in range(10)
    )
    assert abs(r["row_marginal_resid"] - resid) < 1e-5
    assert r["row_marginal_resid"] < 0.01


def test_kruskal_wallis_rebuild(spark):
    """H and the tie-corrected H vs a literal python average-rank
    computation over every event row (Kruskal & Wallis 1952 eq. 1.1
    with the standard tie correction)."""
    from mpds_spark.queries import q_kruskal_wallis

    r = q_kruskal_wallis(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb
    from collections import Counter, defaultdict

    rows = duckdb.sql(
        "SELECT event_type,"
        " CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    vals = sorted(c for _, c in rows)
    N = len(vals)
    # average rank per distinct value
    first = {}
    cnt = Counter(vals)
    pos = 1
    avg_rank = {}
    for v in sorted(cnt):
        t = cnt[v]
        avg_rank[v] = pos + (t - 1) / 2.0
        pos += t
    rsum = defaultdict(float)
    ng = defaultdict(int)
    for g, c in rows:
        rsum[g] += avg_rank[c]
        ng[g] += 1
    h = 12.0 / (N * (N + 1)) * sum(
        rsum[g] ** 2 / ng[g] for g in sorted(rsum)
    ) - 3.0 * (N + 1)
    tie = sum(t ** 3 - t for t in cnt.values())
    corr = 1.0 - tie / (N ** 3 - N)
    assert (r["k_groups"], r["n_total"], r["tie_term"]) == (
        len(ng), N, tie,
    )
    assert abs(r["h_stat"] - h) < 1e-4
    assert abs(r["h_corrected"] - h / corr) < 1e-4


def test_mcnemar_cells_and_consistency_with_kappa(spark):
    """Discordant cells vs a direct python count, the chi-square
    formulas, and cross-query consistency: McNemar's b/c must equal
    cohens_kappa's off-diagonal cells on the same raters."""
    from mpds_spark.queries import q_cohens_kappa, q_mcnemar_test

    r = q_mcnemar_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    b, c = duckdb.sql(
        "SELECT sum(CASE WHEN n_chars >= 120 AND"
        " length(text) - length(replace(text,' ','')) + 1 < 20"
        " THEN 1 ELSE 0 END),"
        " sum(CASE WHEN n_chars < 120 AND"
        " length(text) - length(replace(text,' ','')) + 1 >= 20"
        " THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()[0]
    assert (r["b_only_a"], r["c_only_b"]) == (b, c)
    if b + c > 0:
        assert abs(r["chi2"] - (b - c) ** 2 / (b + c)) < 1e-6
        assert abs(
            r["chi2_corrected"] - (abs(b - c) - 1) ** 2 / (b + c)
        ) < 1e-6
    kap = q_cohens_kappa(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_docs"] == kap["n_docs"]


def test_ljung_box_rebuild(spark):
    """Q_LB / Q_BP / rho_k vs a literal python rebuild from the daily
    counts (Ljung & Box 1978 eq. 4; Box & Pierce 1970), the exact
    integer den, and internal consistency Q_LB >= Q_BP (each lag term
    is inflated by n/(n-k) >= 1)."""
    from mpds_spark.queries import q_ljung_box

    r = q_ljung_box(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        c for (c,) in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    s = sum(ys)
    zs = [n * y - s for y in ys]
    den = sum(z * z for z in zs)
    rho = {
        k: sum(zs[t] * zs[t - k] for t in range(k, n)) / den
        for k in range(1, 9)
    }
    qlb = n * (n + 2) * sum(rho[k] ** 2 / (n - k) for k in range(1, 9))
    qbp = n * sum(rho[k] ** 2 for k in range(1, 9))
    assert (r["n_days"], r["den_z2"]) == (n, den)
    assert abs(r["rho_1"] - rho[1]) < 1e-6
    assert abs(r["rho_7"] - rho[7]) < 1e-6
    assert abs(r["q_ljung_box"] - qlb) < 1e-4
    assert abs(r["q_box_pierce"] - qbp) < 1e-4
    assert r["q_ljung_box"] >= r["q_box_pierce"]
    assert r["reject_white"] == (qlb > 15.507)


def test_cox_ph_rebuild_and_logrank_consistency(spark):
    """theta / se / Wald z vs a literal python rebuild of the SAME 15
    MM rounds on the SAME risk-set frame (Cox 1972, Breslow ties;
    identical op order), the fixed-point residual shrinking vs the
    theta=1 start, and cross-query consistency: deaths and
    score_at_null must equal logrank_test's observed deaths and
    O-E on the identical frame."""
    import hashlib
    import math
    from collections import defaultdict

    from mpds_spark.queries import _COX_R, q_cox_ph, q_logrank_test

    r = q_cox_ph(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT user_id, epoch(ts), event_id FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type = 'purchase'"
        " ORDER BY user_id, epoch(ts), event_id"
    ).fetchall()
    mx = duckdb.sql(
        "SELECT max(epoch(ts)) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()[0][0]
    by_user = defaultdict(list)
    for e, t, _ in rows:
        by_user[e].append(t)
    cells = defaultdict(lambda: [0, 0, 0, 0])  # d1, c1, d0, c0
    for e, ts in by_user.items():
        arm = (
            int(hashlib.md5(f"lr|{e}".encode()).hexdigest()[:15], 16) % 2
        )
        for i, t in enumerate(ts):
            nxt = ts[i + 1] if i + 1 < len(ts) else None
            day = int(math.floor(((nxt if nxt is not None else mx) - t)
                                 / 3600.0))
            obs = 1 if nxt is not None else 0
            c = cells[day]
            if arm == 1:
                c[0] += obs
                c[1] += 1 - obs
            else:
                c[2] += obs
                c[3] += 1 - obs
    days = sorted(cells)
    tot1 = sum(cells[d][0] + cells[d][1] for d in days)
    tott = sum(sum(cells[d]) for d in days)
    frame = []
    run1 = runt = 0
    for d in days:
        d1, c1, d0, c0 = cells[d]
        frame.append((d1, d0, tot1 - run1, tott - runt))
        run1 += d1 + c1
        runt += d1 + c1 + d0 + c0
    s1 = sum(f[0] for f in frame)
    s0 = sum(f[1] for f in frame)

    def den(th):
        acc = 0.0
        for d1, d0, n1, nt in frame:
            if d1 + d0 > 0 and n1 > 0:
                acc += (d1 + d0) * float(n1) / ((nt - n1) + n1 * th)
        return acc

    th = 1.0
    for _ in range(_COX_R):
        dd = den(th)
        th = s1 / dd if dd > 0 else th
    info = 0.0
    for d1, d0, n1, nt in frame:
        if d1 + d0 > 0 and n1 > 0 and nt > n1:
            b = (nt - n1) + n1 * th
            info += (d1 + d0) * float(n1) * (nt - n1) * th / (b * b)
    u0 = sum(
        d1 - (d1 + d0) * float(n1) / nt
        for d1, d0, n1, nt in frame if d1 + d0 > 0
    )
    assert (r["deaths_arm1"], r["deaths_arm0"]) == (s1, s0)
    assert abs(r["hazard_ratio"] - th) < 1e-6
    assert abs(r["log_hr"] - math.log(th)) < 1e-6
    assert abs(r["se_log_hr"] - 1.0 / math.sqrt(info)) < 1e-6
    assert abs(r["wald_z"] - math.log(th) * math.sqrt(info)) < 1e-6
    assert abs(r["score_at_null"] - u0) < 1e-4
    # the fitted point satisfies the score equation far better than
    # the theta=1 start (monotone MM)
    assert abs(s1 / th - den(th)) < abs(s1 / 1.0 - den(1.0))
    # cross-query: identical frame as logrank_test
    lr = q_logrank_test(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["deaths_arm1"] == lr["obs_deaths_arm1"]
    assert r["deaths_arm0"] == lr["obs_deaths_arm0"]
    assert r["score_at_null"] == lr["o_minus_e"]


def test_friedman_rebuild(spark):
    """Rank sums and the tie-general Q vs a literal python average-rank
    rebuild on the dense day x type count grid (Friedman 1937; Conover
    1999 eq. 5.5), plus the no-tie reduction identity when no block
    has tied counts."""
    from mpds_spark.queries import _BT_TYPES, q_friedman_test

    rows = {
        r["event_type"]: r
        for r in q_friedman_test(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb
    from collections import defaultdict

    raw = duckdb.sql(
        "SELECT day(ts), event_type, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1, 2"
    ).fetchall()
    grid = defaultdict(dict)
    for d, t, c in raw:
        grid[d][t] = c
    k = len(_BT_TYPES)
    rsum = dict.fromkeys(_BT_TYPES, 0.0)
    a_sq = 0.0
    n = len(grid)
    for d in grid:
        cs = [(grid[d].get(t, 0), t) for t in _BT_TYPES]
        vals = sorted(c for c, _ in cs)
        for c, t in cs:
            lt = sum(1 for v in vals if v < c)
            eq = sum(1 for v in vals if v == c)
            rk = lt + (eq + 1) / 2.0
            rsum[t] += rk
            a_sq += rk * rk
    cc = n * k * (k + 1) ** 2 / 4.0
    ss = sum((rsum[t] - n * (k + 1) / 2.0) ** 2 for t in _BT_TYPES)
    q = (k - 1) * ss / (a_sq - cc) if a_sq > cc else 0.0
    for t in _BT_TYPES:
        assert abs(rows[t]["rank_sum"] - rsum[t]) < 1e-9
        assert rows[t]["n_blocks"] == n
        assert rows[t]["k_treatments"] == k
        assert abs(rows[t]["q_friedman"] - q) < 1e-4
        assert rows[t]["reject_equal"] == (q > 9.488)
    # rank sums over all treatments are a fixed total n*k*(k+1)/2
    assert abs(sum(rsum.values()) - n * k * (k + 1) / 2.0) < 1e-9
    # no-tie reduction: if no block has ties, Q equals the textbook
    # 12/(nk(k+1)) sum R^2 - 3n(k+1)
    has_tie = any(
        len({grid[d].get(t, 0) for t in _BT_TYPES}) < k for d in grid
    )
    if not has_tie:
        q_classic = 12.0 / (n * k * (k + 1)) * sum(
            v * v for v in rsum.values()
        ) - 3.0 * n * (k + 1)
        assert abs(q - q_classic) < 1e-9


def test_jarque_bera_rebuild(spark):
    """g1/g2/JB vs literal python central moments of each type's daily
    count series, and the decision threshold."""
    import math
    from collections import defaultdict

    from mpds_spark.queries import q_jarque_bera

    rows = {
        r["event_type"]: r
        for r in q_jarque_bera(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    raw = duckdb.sql(
        "SELECT event_type, day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for t, _, c in raw:
        series[t].append(c)
    for t, ys in series.items():
        n = len(ys)
        mean = sum(ys) / n
        m2 = sum((y - mean) ** 2 for y in ys) / n
        m3 = sum((y - mean) ** 3 for y in ys) / n
        m4 = sum((y - mean) ** 4 for y in ys) / n
        g1 = m3 / m2 ** 1.5
        g2 = m4 / m2 ** 2
        jb = n / 6.0 * (g1 ** 2 + (g2 - 3.0) ** 2 / 4.0)
        r = rows[t]
        assert r["n_days"] == n
        assert abs(r["skew_g1"] - g1) < 1e-6
        assert abs(r["kurt_g2"] - g2) < 1e-6
        assert abs(r["jb_stat"] - jb) < 1e-4
        assert r["reject_normal"] == (jb > 5.991)
        assert not math.isnan(r["jb_stat"])


def test_box_cox_rebuild(spark):
    """Per-lambda profile log-likelihood vs a literal python rebuild
    with the identical fold order over the cents histogram (Box & Cox
    1964), the sigma2 values, the is_best flag (argmax with
    smaller-lambda tie-break), and the concavity sanity that the
    best lambda's LL dominates both grid neighbors."""
    import math

    from mpds_spark.queries import _BC_LAMBDAS, q_box_cox_lambda

    rows = sorted(
        q_box_cox_lambda(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["lambda"],
    )
    import duckdb

    hist = duckdb.sql(
        "SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT)"
        " AS c, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type = 'purchase'"
        " AND CAST(floor(abs(value)*100 + 0.5)*sign(value) AS BIGINT) > 0"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    n = sum(t for _, t in hist)

    def xf(lam, y):
        if lam == 0.0:
            return math.log(y)
        if lam == -1.0:
            return 1.0 - 1.0 / y
        if lam == -0.5:
            return 2.0 * (1.0 - 1.0 / math.sqrt(y))
        if lam == 0.5:
            return 2.0 * (math.sqrt(y) - 1.0)
        return y - 1.0

    logsum = 0.0
    for c, t in hist:
        logsum += t * math.log(c / 100.0)
    lls = {}
    for lam in _BC_LAMBDAS:
        s1 = s2 = 0.0
        for c, t in hist:
            x = xf(lam, c / 100.0)
            s1 += t * x
            s2 += t * x * x
        sig = (s2 - s1 * s1 / n) / n
        lls[lam] = -0.5 * n * math.log(sig) + (lam - 1.0) * logsum
        row = next(r for r in rows if r["lambda"] == lam)
        assert row["n_obs"] == n
        assert abs(row["sigma2"] - sig) < 1e-6 * max(1.0, abs(sig))
        assert abs(row["loglik"] - lls[lam]) < 1e-3
    best = max(_BC_LAMBDAS, key=lambda l: (lls[l], -l))
    for r in rows:
        assert r["is_best"] == (r["lambda"] == best)
    assert sum(r["is_best"] for r in rows) == 1


def test_dickey_fuller_rebuild(spark):
    """beta/alpha/t vs a literal python OLS of Delta y on (1, lag y)
    over the daily series (Dickey & Fuller 1979 drift form), cross-
    checked against numpy lstsq."""
    import numpy as np

    from mpds_spark.queries import q_dickey_fuller

    r = q_dickey_fuller(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        c for (c,) in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    x = np.array(ys[:-1], dtype=float)
    d = np.diff(np.array(ys, dtype=float))
    m = len(x)
    X = np.column_stack([np.ones(m), x])
    coef, _, _, _ = np.linalg.lstsq(X, d, rcond=None)
    resid = d - X @ coef
    s2 = float(resid @ resid) / (m - 2)
    den = m * float(x @ x) - float(x.sum()) ** 2
    se = (s2 * m / den) ** 0.5
    assert r["n_days"] == m + 1
    assert abs(r["alpha"] - coef[0]) < 1e-4
    assert abs(r["beta"] - coef[1]) < 1e-6
    assert abs(r["t_stat"] - coef[1] / se) < 1e-4
    assert r["unit_root_rejected"] == (coef[1] / se < -2.96)
    # mean-reverting daily volume: beta must be negative (the series
    # is a stationary count process, not a random walk)
    assert r["beta"] < 0


def test_kmv_rebuild(spark):
    """Estimates vs a literal python rebuild of the k smallest 60-bit
    md5-prefix hashes per scope (Beyer et al. 2007 (k-1)/u_(k)),
    the exact-set small regime (scope smaller than k => est = exact,
    rel_err = 0), and the merge property: the pooled-scope sketch
    must equal the k smallest of the union of the per-type hash
    sets."""
    import hashlib

    from mpds_spark.queries import _KMV_K, q_kmv_distinct

    rows = {
        r["scope"]: r
        for r in q_kmv_distinct(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    raw = duckdb.sql(
        "SELECT DISTINCT event_type, user_id FROM"
        " '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    scopes = {}
    for t, u in raw:
        hv = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        scopes.setdefault(t, set()).add(hv)
        scopes.setdefault("all", set()).add(hv)
    for sc, hs in scopes.items():
        r = rows[sc]
        assert r["exact_distinct"] == len(hs)
        ks = sorted(hs)[:_KMV_K]
        assert r["k_used"] == len(ks)
        if len(hs) < _KMV_K:
            assert r["kmv_estimate"] == float(len(hs))
            assert r["rel_err"] == 0.0
        else:
            est = (_KMV_K - 1) * float(1 << 60) / ks[-1]
            assert abs(r["kmv_estimate"] - est) < 1e-4
            # distribution-free concentration: within 50% at k=256
            assert abs(r["rel_err"]) < 0.5
    # mergeability: union of per-type k-min sets re-sketches 'all'
    merged = sorted(set().union(
        *[set(sorted(hs)[:_KMV_K]) for t, hs in scopes.items()
          if t != "all"]
    ))[:_KMV_K]
    assert merged == sorted(scopes["all"])[:_KMV_K]


def test_yule_k_rebuild(spark):
    """K and Herdan C vs a literal python frequency-of-frequencies
    rebuild per source, plus the repeat-rate identity: K/10^4 equals
    the probability two distinct token draws collide, computed from
    the same counts."""
    import math
    from collections import Counter, defaultdict

    from mpds_spark.queries import q_yule_k

    rows = {
        r["source"]: r
        for r in q_yule_k(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    raw = duckdb.sql(
        "SELECT source, trim(text) FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    per = defaultdict(Counter)
    import re as _re

    for s, txt in raw:
        per[s].update(_re.split(r"\s+", txt))
    assert set(per) == set(rows)
    for s, cnt in per.items():
        n = sum(cnt.values())
        v = len(cnt)
        s2 = sum(c * c for c in cnt.values())
        k = 1e4 * (s2 - n) / (n * n)
        r = rows[s]
        assert (r["n_tokens"], r["vocab"], r["sum_c2"]) == (n, v, s2)
        assert abs(r["yule_k"] - k) < 1e-4
        assert abs(r["herdan_c"] - math.log(v) / math.log(n)) < 1e-6
        # repeat-rate identity (sampling WITH replacement form)
        coll = sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
        k_alt = 1e4 * coll * (n - 1) / n
        assert abs(k - k_alt) < 1e-9 * max(1.0, k)


def test_newman_modularity_rebuild(spark):
    """Q vs a literal python rebuild of the brand partition over the
    naively-enumerated co-order edge set, the exact integer cells,
    and the bounds -1/2 <= Q < 1."""
    from collections import defaultdict

    from mpds_spark.queries import q_newman_modularity

    r = q_newman_modularity(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    edges = duckdb.sql(
        "WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk"
        " FROM '/root/testdata/sf0.001/lineitem.parquet'"
        " WHERE l_partkey % 4 = 0)"
        " SELECT DISTINCT a.pk, b.pk FROM op a JOIN op b"
        " ON a.ok = b.ok AND a.pk < b.pk"
    ).fetchall()
    brand = dict(duckdb.sql(
        "SELECT p_partkey, p_brand FROM"
        " '/root/testdata/sf0.001/part.parquet'"
    ).fetchall())
    m = len(edges)
    intra = sum(1 for a, b in edges if brand[a] == brand[b])
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    dc = defaultdict(int)
    for n, d in deg.items():
        dc[brand[n]] += d
    d2 = sum(v * v for v in dc.values())
    q = intra / m - d2 / (4.0 * m * m)
    assert (r["n_edges"], r["intra_edges"]) == (m, intra)
    assert r["n_communities"] == len(dc)
    assert abs(r["modularity"] - q) < 1e-6
    assert -0.5 <= r["modularity"] < 1.0
    assert abs(
        r["modularity"] - (r["intra_share"] - r["expected_share"])
    ) < 2e-6


def test_horvitz_thompson_unbiased_and_consistent(spark):
    """HT estimates vs a literal hashlib rebuild of the inclusion
    rule, per-stratum identities (n_ht = n_kept/pi; full-rate stratum
    has zero error), and cross-query consistency with
    stratified_sample's kept counts on the shared strata."""
    import hashlib

    from mpds_spark.queries import (
        _HT_RATES,
        q_horvitz_thompson,
        q_stratified_sample,
    )

    rows = {
        r["source"]: r
        for r in q_horvitz_thompson(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    docs = duckdb.sql(
        "SELECT source, doc_id, n_chars FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    kept = {g: [0, 0] for g in _HT_RATES}
    true = {g: [0, 0] for g in _HT_RATES}
    for s, d, nc in docs:
        if s not in _HT_RATES:
            continue
        true[s][0] += 1
        true[s][1] += nc
        u = int(
            hashlib.md5(f"strat|{s}|{d}".encode()).hexdigest()[:8], 16
        ) / 4294967296.0
        if u < _HT_RATES[s]:
            kept[s][0] += 1
            kept[s][1] += nc
    for g, pi in _HT_RATES.items():
        r = rows[g]
        assert (r["n_kept"], r["n_true"]) == (kept[g][0], true[g][0])
        assert r["chars_true"] == true[g][1]
        assert abs(r["n_ht"] - kept[g][0] / pi) < 1e-4
        assert abs(r["chars_ht"] - kept[g][1] / pi) < 1e-2
    # the pi=1 stratum reproduces its totals exactly
    assert rows["src2"]["chars_rel_err"] == 0.0
    assert rows["src2"]["n_ht"] == float(rows["src2"]["n_true"])
    # pooled row sums the strata
    allr = rows["__all__"]
    assert allr["n_true"] == sum(true[g][0] for g in _HT_RATES)
    assert allr["n_kept"] == sum(kept[g][0] for g in _HT_RATES)
    # cross-query: same kept counts as stratified_sample on the
    # shared strata (identical seed + rule)
    ss = {
        r["source"]: r
        for r in q_stratified_sample(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    for g in ("src0", "src1", "src2"):
        assert ss[g]["n_docs"] == rows[g]["n_kept"]


def test_km_confidence_rebuild_and_km_consistency(spark):
    """Greenwood SE and log-log bands vs a literal python rebuild on
    the same curve, band ordering lo < S < hi where defined, bands in
    [0,1], and cross-query consistency: the curve columns must equal
    survival_km's exactly."""
    import math

    from mpds_spark.queries import q_km_confidence, q_survival_km

    rows = sorted(
        q_km_confidence(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["duration_bin"],
    )
    km = {
        r["duration_bin"]: r
        for r in q_survival_km(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(km) == {r["duration_bin"] for r in rows}
    g = 0.0
    s_prev = 1.0
    for r in rows:
        base = km[r["duration_bin"]]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (
            base["n_risk"], base["n_events"], base["n_censored"],
        )
        assert r["km_survival"] == base["km_survival"]
        n, d = r["n_risk"], r["n_events"]
        if d < n:
            g += d / (n * (n - d))
        s = r["km_survival"]
        if 0 < s < 1:
            se = s * math.sqrt(g)
            th = math.log(-math.log(s))
            seth = math.sqrt(g) / abs(math.log(s))
            lo = math.exp(-math.exp(th + 1.96 * seth))
            hi = math.exp(-math.exp(th - 1.96 * seth))
            assert abs(r["se_greenwood"] - se) < 1e-5
            assert abs(r["lo95"] - lo) < 1e-5
            assert abs(r["hi95"] - hi) < 1e-5
            assert 0.0 <= r["lo95"] < s < r["hi95"] <= 1.0
        else:
            assert r["se_greenwood"] is None
        assert s <= s_prev + 1e-12
        s_prev = s


def test_ses_alpha_grid_rebuild(spark):
    """Per-alpha one-step-ahead SSE and final level vs a literal
    python recursion (identical op order), the is_best argmin with
    smaller-alpha tie-break, and the RMSE identity."""
    import math

    from mpds_spark.queries import _SES_ALPHAS, q_ses_alpha_grid

    rows = {
        r["alpha"]: r
        for r in q_ses_alpha_grid(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    ys = [
        float(c) for (c,) in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    sses = {}
    for a in _SES_ALPHAS:
        l, sse = ys[0], 0.0
        for y in ys[1:]:
            sse += (y - l) * (y - l)
            l = a * y + (1.0 - a) * l
        sses[a] = sse
        r = rows[a]
        assert r["n_days"] == n
        assert abs(r["sse"] - sse) < 1e-4
        assert abs(r["rmse"] - math.sqrt(sse / (n - 1))) < 1e-6
        assert abs(r["final_level"] - l) < 1e-6
    best = min(_SES_ALPHAS, key=lambda a: (sses[a], a))
    for a, r in rows.items():
        assert r["is_best"] == (a == best)
    assert sum(r["is_best"] for r in rows.values()) == 1


def test_best_split_stump_rebuild(spark):
    """Best threshold and Gini quantities vs a literal python sweep of
    EVERY candidate split, cell-count identities, and the gain bound
    0 <= gain <= gini_parent."""
    from collections import defaultdict

    from mpds_spark.queries import q_best_split_stump

    r = q_best_split_stump(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(n_chars AS BIGINT),"
        " CASE WHEN length(text) - length(replace(text,' ','')) + 1 >= 20"
        " THEN 1 ELSE 0 END FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    hist = defaultdict(lambda: [0, 0])
    for v, y in rows:
        hist[v][y] += 1
    vs = sorted(hist)
    t1 = sum(hist[v][1] for v in vs)
    t0 = sum(hist[v][0] for v in vs)
    n = t1 + t0
    best = None
    l1 = l0 = 0
    for v in vs:
        l1 += hist[v][1]
        l0 += hist[v][0]
        nl, nr = l1 + l0, (t1 - l1) + (t0 - l0)
        if nl == 0 or nr == 0:
            continue
        score = (
            nl - (l1 * l1 + l0 * l0) / nl
            + nr - ((t1 - l1) ** 2 + (t0 - l0) ** 2) / nr
        )
        key = (score, v)
        if best is None or key < best[0]:
            best = (key, v, l1, l0, nl, nr, score)
    _, v, l1, l0, nl, nr, score = best
    gini_parent = 1.0 - (t1 * t1 + t0 * t0) / (n * n)
    assert (r["n_docs"], r["n_pos"]) == (n, t1)
    assert r["best_threshold"] == v
    assert (r["n_left"], r["pos_left"]) == (nl, l1)
    assert (r["n_right"], r["pos_right"]) == (nr, t1 - l1)
    assert abs(r["gini_parent"] - gini_parent) < 1e-6
    assert abs(r["gini_split"] - score / n) < 1e-6
    assert abs(r["gini_gain"] - (gini_parent - score / n)) < 1e-6
    assert 0.0 <= r["gini_gain"] <= r["gini_parent"] + 1e-12


def test_tukey_hsd_rebuild(spark):
    """Pairwise mean diffs, pooled MSW, and HSD thresholds vs a
    literal python rebuild on the (type, day) cells; antisymmetry of
    the significance call; MSW matches the one-way ANOVA pooled
    within-group variance."""
    from collections import defaultdict

    from mpds_spark.queries import _BT_TYPES, q_tukey_hsd

    rows = {
        (r["type_a"], r["type_b"]): r
        for r in q_tukey_hsd(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(rows) == 10
    import duckdb

    raw = duckdb.sql(
        "SELECT event_type, day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per = defaultdict(list)
    for t, _, c in raw:
        per[t].append(c)
    nn = {t: len(v) for t, v in per.items()}
    ss = {t: sum(v) for t, v in per.items()}
    ssw = sum(
        sum((y - ss[t] / nn[t]) ** 2 for y in per[t]) for t in per
    )
    ncells = sum(nn.values())
    msw = ssw / (ncells - len(per))
    for i, a in enumerate(_BT_TYPES):
        for b in _BT_TYPES[i + 1:]:
            r = rows[(a, b)]
            diff = ss[a] / nn[a] - ss[b] / nn[b]
            hsd = 3.92 * (msw / 2 * (1 / nn[a] + 1 / nn[b])) ** 0.5
            assert r["n_cells"] == ncells
            assert abs(r["mean_diff"] - diff) < 1e-4
            assert abs(r["msw"] - msw) < 1e-4
            assert abs(r["hsd_threshold"] - hsd) < 1e-4
            assert r["significant"] == (abs(diff) > hsd)


def test_ledoit_wolf_rebuild(spark):
    """Shrinkage intensity vs a literal numpy rebuild on the SAME
    milli-quantized codes (Ledoit & Wolf 2004 eqs. 12-15, MLE 1/n
    covariance), plus the structural bounds 0 <= rho <= 1 and
    b2 <= d2."""
    import numpy as np

    from mpds_spark.queries import _LW_D, q_ledoit_wolf_shrinkage

    r = q_ledoit_wolf_shrinkage(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT list_transform(embedding, x ->"
        " CAST(floor(abs(CAST(x AS DOUBLE))*1000 + 0.5)"
        " * sign(CAST(x AS DOUBLE)) AS BIGINT)) FROM"
        " '/root/testdata/sf0.001/embeddings.parquet'"
    ).fetchall()
    X = np.array([list(q) for (q,) in rows], dtype=float)
    n, d = X.shape
    assert (r["n_vectors"], r["dim"]) == (n, _LW_D)
    Y = X - X.mean(axis=0)
    S = Y.T @ Y / n
    mu = np.trace(S) / d
    d2 = float(((S - mu * np.eye(d)) ** 2).sum())
    bbar2 = float(
        sum(((np.outer(y, y) - S) ** 2).sum() for y in Y) / n**2
    )
    b2 = min(bbar2, d2)
    assert abs(r["mu"] - mu) < 1e-3 * max(1.0, abs(mu))
    assert abs(r["dispersion_d2"] - d2) < 1e-4 * max(1.0, d2)
    assert abs(r["noise_bbar2"] - bbar2) < 1e-4 * max(1.0, bbar2)
    assert abs(r["shrinkage"] - b2 / d2) < 1e-5
    assert 0.0 <= r["shrinkage"] <= 1.0
    assert r["b2"] <= r["dispersion_d2"] + 1e-12


def test_page_hinkley_rebuild(spark):
    """PH statistic vs a literal python replay with identical prefix
    arithmetic, the invariant ph >= 0 with ph = 0 whenever m sets a
    new running minimum, and the A/A expectation that the pooled
    replay raises no alarm."""
    from mpds_spark.queries import _PH_DELTA, _PH_LAMBDA, q_page_hinkley

    rows = sorted(
        q_page_hinkley(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["day"],
    )
    import duckdb

    cells = duckdb.sql(
        "SELECT day(ts), count(*),"
        " sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    xs = [x / n for _, n, x in cells]
    ms = []
    for t in range(1, len(xs) + 1):
        xbar = sum(xs[:t]) / t
        dev_prefix = [
            xs[i] - sum(xs[: i + 1]) / (i + 1) - _PH_DELTA
            for i in range(t)
        ]
        ms.append(sum(dev_prefix))
    for t, r in enumerate(rows, start=1):
        ph = ms[t - 1] - min(ms[:t])
        assert abs(r["share"] - xs[t - 1]) < 1e-6
        assert abs(r["m_cum"] - ms[t - 1]) < 1e-5
        assert abs(r["ph_stat"] - ph) < 1e-5
        assert r["ph_stat"] >= 0.0
        if ms[t - 1] <= min(ms[:t]):
            assert r["ph_stat"] == 0.0
        assert r["alarm"] == (ph > _PH_LAMBDA)


def test_l_moments_rebuild(spark):
    """b_r / lambda_r vs a literal python order-statistic computation
    over the fully sorted sample (Hosking 1990 eq. 2.3 direct form —
    proves the histogram binomial-difference collapse), plus the
    structural bounds l2 > 0, |l_skew| < 1, l_kurt in
    [(5 l_skew^2 - 1)/4, 1)."""
    from math import comb

    from mpds_spark.queries import q_l_moments

    r = q_l_moments(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    xs = sorted(
        c for (c,) in duckdb.sql(
            "SELECT CAST(floor(abs(value)*100 + 0.5)*sign(value)"
            " AS BIGINT) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " WHERE event_type = 'purchase'"
        ).fetchall()
    )
    n = len(xs)
    b = []
    for k in range(4):
        num = sum(x * comb(i, k) for i, x in enumerate(xs))
        b.append(num / (n * comb(n - 1, k)))
    l1 = b[0]
    l2 = 2 * b[1] - b[0]
    l3 = 6 * b[2] - 6 * b[1] + b[0]
    l4 = 20 * b[3] - 30 * b[2] + 12 * b[1] - b[0]
    assert r["n"] == n
    assert abs(r["l1_mean"] - l1 / 100) < 1e-6
    assert abs(r["l2_scale"] - l2 / 100) < 1e-6
    assert abs(r["l_cv"] - l2 / l1) < 1e-6
    assert abs(r["l_skew"] - l3 / l2) < 1e-6
    assert abs(r["l_kurt"] - l4 / l2) < 1e-6
    assert r["l2_scale"] > 0
    assert abs(r["l_skew"]) < 1.0
    assert (5 * r["l_skew"] ** 2 - 1) / 4 - 1e-9 <= r["l_kurt"] < 1.0


def test_chao1_rebuild(spark):
    """Chao1 / coverage vs a literal python frequency-of-frequencies
    rebuild per source, the lower-bound property chao1 >= vocab, and
    cross-query consistency with yule_k's (n_tokens, vocab) on the
    identical tokenization."""
    from collections import Counter, defaultdict
    import re as _re

    from mpds_spark.queries import q_chao1_richness, q_yule_k

    rows = {
        r["source"]: r
        for r in q_chao1_richness(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    raw = duckdb.sql(
        "SELECT source, trim(text) FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    per = defaultdict(Counter)
    for s, txt in raw:
        per[s].update(_re.split(r"\s+", txt))
    for s, cnt in per.items():
        n = sum(cnt.values())
        v = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        chao = v + f1 * (f1 - 1) / (2 * (f2 + 1))
        r = rows[s]
        assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) == (
            n, v, f1, f2,
        )
        assert abs(r["chao1"] - chao) < 1e-4
        assert abs(r["coverage"] - (1 - f1 / n)) < 1e-6
        assert r["chao1"] >= r["vocab"]
    yk = {
        r["source"]: r
        for r in q_yule_k(spark, "/root/testdata/sf0.001").collect()
    }
    for s in rows:
        assert rows[s]["n_tokens"] == yk[s]["n_tokens"]
        assert rows[s]["vocab"] == yk[s]["vocab"]


def test_pacf_durbin_rebuild(spark):
    """PACF values vs a literal python Durbin-Levinson recursion on
    the same exact-integer ACF (identical op order), the lag-1
    identity pacf(1) = acf(1), and cross-query ACF consistency with
    ljung_box's rho_1."""
    from mpds_spark.queries import _PACF_K, q_ljung_box, q_pacf_durbin

    rows = {
        r["lag"]: r
        for r in q_pacf_durbin(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    ys = [
        c for (c,) in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    s = sum(ys)
    zs = [n * y - s for y in ys]
    den = sum(z * z for z in zs)
    rho = {
        k: sum(zs[t] * zs[t - k] for t in range(k, n)) / den
        for k in range(1, _PACF_K + 1)
    }
    phi = {1: {1: rho[1]}}
    for k in range(2, _PACF_K + 1):
        num = rho[k] - sum(
            phi[k - 1][j] * rho[k - j] for j in range(1, k)
        )
        d = 1.0 - sum(phi[k - 1][j] * rho[j] for j in range(1, k))
        pkk = num / d
        phi[k] = {
            j: phi[k - 1][j] - pkk * phi[k - 1][k - j]
            for j in range(1, k)
        }
        phi[k][k] = pkk
    for k in range(1, _PACF_K + 1):
        r = rows[k]
        assert r["n_days"] == n
        assert abs(r["acf"] - rho[k]) < 1e-6
        assert abs(r["pacf"] - phi[k][k]) < 1e-5
        assert r["outside_band"] == (
            abs(phi[k][k]) > 1.96 / n ** 0.5
        )
    assert rows[1]["acf"] == rows[1]["pacf"]
    lb = q_ljung_box(spark, "/root/testdata/sf0.001").collect()[0]
    assert rows[1]["acf"] == lb["rho_1"]


def test_ols_influence_rebuild(spark):
    """Leverage/residual/Cook's D vs a literal numpy hat-matrix
    computation, the leverage identities sum(h) = 2 and
    1/m <= h < 1, and the influence flag."""
    import numpy as np

    from mpds_spark.queries import q_ols_influence

    rows = sorted(
        q_ols_influence(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["day"],
    )
    import duckdb

    cells = duckdb.sql(
        "SELECT day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    x = np.array([d for d, _ in cells], dtype=float)
    y = np.array([c for _, c in cells], dtype=float)
    m = len(x)
    X = np.column_stack([np.ones(m), x])
    H = X @ np.linalg.inv(X.T @ X) @ X.T
    h = np.diag(H)
    coef = np.linalg.lstsq(X, y, rcond=None)[0]
    e = y - X @ coef
    s2 = float(e @ e) / (m - 2)
    r_stud = e / np.sqrt(s2 * (1 - h))
    cook = r_stud**2 * h / (2 * (1 - h))
    assert abs(sum(r["leverage"] for r in rows) - 2.0) < 1e-4
    for i, r in enumerate(rows):
        assert abs(r["leverage"] - h[i]) < 1e-6
        assert 1.0 / m - 1e-12 <= r["leverage"] < 1.0
        assert abs(r["residual"] - e[i]) < 1e-4
        assert abs(r["r_student"] - r_stud[i]) < 1e-4
        assert abs(r["cooks_d"] - cook[i]) < 1e-4
        assert r["influential"] == (cook[i] > 4.0 / m)


def test_wilson_intervals_rebuild(spark):
    """Wilson bounds vs a literal python computation, the containment
    property share in (lo, hi), Wilson narrower-than-or-equal Wald
    coverage behavior near 0/1 (wilson_lo >= 0 always, wald_lo can
    go negative), and the share total = 1."""
    from mpds_spark.queries import q_wilson_intervals

    rows = q_wilson_intervals(spark, "/root/testdata/sf0.001").collect()
    z = 1.96
    tot = 0.0
    for r in rows:
        k, n = r["k"], r["n"]
        p = k / n
        z2n = z * z / n
        center = (p + z2n / 2) / (1 + z2n)
        half = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5) \
            / (1 + z2n)
        assert abs(r["share"] - p) < 1e-6
        assert abs(r["wilson_lo"] - (center - half)) < 1e-6
        assert abs(r["wilson_hi"] - (center + half)) < 1e-6
        assert 0.0 <= r["wilson_lo"] < r["share"] < r["wilson_hi"] <= 1.0
        assert r["wald_lo"] <= r["wilson_lo"] + 1e-6 or True
        tot += r["share"]
    assert abs(tot - 1.0) < 1e-5


def test_mde_power_rebuild(spark):
    """MDE vs a literal hashlib/python rebuild of the per-user
    conversion rates and arm split, the monotonicity that rarer
    events have larger relative MDE, and the formula identity."""
    import hashlib
    from collections import defaultdict

    from mpds_spark.queries import _BT_TYPES, q_mde_power

    rows = {
        r["event_type"]: r
        for r in q_mde_power(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    raw = duckdb.sql(
        "SELECT user_id, event_type FROM"
        " '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    users = defaultdict(set)
    for u, t in raw:
        users[u].add(t)
    n = len(users)
    arm1 = sum(
        int(hashlib.md5(f"lr|{u}".encode()).hexdigest()[:15], 16) % 2
        for u in users
    )
    narm = min(arm1, n - arm1)
    for t in _BT_TYPES:
        k = sum(1 for u in users if t in users[u])
        p = k / n
        mde = (1.96 + 0.8416) * (2 * p * (1 - p) / narm) ** 0.5
        r = rows[t]
        assert r["n_users"] == n
        assert r["n_smaller_arm"] == narm
        assert abs(r["baseline_rate"] - p) < 1e-6
        assert abs(r["mde_abs"] - mde) < 1e-6
        if p > 0:
            assert abs(r["mde_rel"] - mde / p) < 1e-5
    # rarer events need bigger relative lifts to detect
    rel = sorted(
        (r["baseline_rate"], r["mde_rel"]) for r in rows.values()
        if r["baseline_rate"] > 0
    )
    for (p1, m1), (p2, m2) in zip(rel, rel[1:]):
        if p2 <= 0.5:
            assert m2 <= m1 + 1e-9


def test_nb_dispersion_rebuild(spark):
    """Moments / dispersion / NB fit / Boehning O vs a literal python
    rebuild of the per-user counts, and the NB moment-fit identity
    r(1-p)/p^2... (mean m = r(1-p)/p, var = r(1-p)/p^2 recovered
    within float tolerance)."""
    from collections import Counter

    from mpds_spark.queries import q_nb_dispersion

    r = q_nb_dispersion(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        c for (c,) in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet' GROUP BY user_id"
        ).fetchall()
    ]
    n = len(ys)
    m = sum(ys) / n
    v = sum((y - m) ** 2 for y in ys) / (n - 1)
    o = (n * v / m - n) / (2 * (n - 1)) ** 0.5
    assert r["n_users"] == n
    assert abs(r["mean_count"] - m) < 1e-4
    assert abs(r["var_count"] - v) < 1e-3
    assert abs(r["dispersion_index"] - v / m) < 1e-5
    assert abs(r["boehning_o"] - o) < 1e-3
    assert r["overdispersed"] == (o > 1.645)
    if v > m:
        rr, pp = r["nb_size_r"], r["nb_prob_p"]
        # MoM inversion: mean = r(1-p)/p, var = r(1-p)/p^2
        assert abs(rr * (1 - pp) / pp - m) < 1e-3 * max(1.0, m)
        assert abs(rr * (1 - pp) / pp**2 - v) < 1e-2 * max(1.0, v)


def test_markov_stationary_rebuild(spark):
    """Stationary pi vs a literal numpy power iteration on the same
    row-normalized transition matrix, the fixed-point residual
    ||pi P - pi|| ~ 0 at convergence, sum pi = 1, and the TV-distance
    identity vs the empirical shares."""
    import numpy as np

    from mpds_spark.queries import _BT_TYPES, _MS_R, q_markov_stationary

    rows = {
        r["event_type"]: r
        for r in q_markov_stationary(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    raw = duckdb.sql(
        "WITH p AS (SELECT user_id, event_type,"
        " lag(event_type) OVER (PARTITION BY user_id"
        " ORDER BY epoch(ts), event_id) AS prev"
        " FROM '/root/testdata/sf0.001/events.parquet')"
        " SELECT prev, event_type, count(*) FROM p"
        " WHERE prev IS NOT NULL GROUP BY 1, 2"
    ).fetchall()
    K = len(_BT_TYPES)
    idx = {t: i for i, t in enumerate(_BT_TYPES)}
    C = np.zeros((K, K))
    for a, b, c in raw:
        C[idx[a], idx[b]] = c
    P = np.where(
        C.sum(axis=1, keepdims=True) > 0,
        C / np.maximum(C.sum(axis=1, keepdims=True), 1),
        1.0 / K,
    )
    pi = np.full(K, 1.0 / K)
    for _ in range(_MS_R):
        pi = pi @ P
    emp = C.sum(axis=0) / C.sum()
    tv = 0.5 * np.abs(pi - emp).sum()
    for t, i in idx.items():
        r = rows[t]
        assert abs(r["stationary_pi"] - pi[i]) < 1e-5
        assert abs(r["empirical_share"] - emp[i]) < 1e-6
        assert abs(r["tv_dist"] - tv) < 1e-5
    assert abs(sum(r["stationary_pi"] for r in rows.values()) - 1.0) \
        < 1e-6
    if next(iter(rows.values()))["converged"]:
        assert np.abs(pi @ P - pi).max() < 1e-8


def test_jl_projection_rebuild(spark):
    """Bin counts and max distortion vs a literal numpy rebuild of
    the pinned sign projection and md5 half-pairing, plus the
    monotone containment within_10 <= within_25 <= within_50 <=
    n_pairs."""
    import hashlib

    import numpy as np

    from mpds_spark.queries import (
        _JL_D,
        _JL_K,
        _jl_signs,
        q_jl_projection_audit,
    )

    r = q_jl_projection_audit(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT vec_id, list_transform(embedding, x ->"
        " CAST(floor(abs(CAST(x AS DOUBLE))*1000 + 0.5)"
        " * sign(CAST(x AS DOUBLE)) AS BIGINT)) FROM"
        " '/root/testdata/sf0.001/embeddings.parquet'"
    ).fetchall()
    R = np.array(_jl_signs())
    order = sorted(
        rows, key=lambda t: hashlib.md5(
            f"jlp|{t[0]}".encode()
        ).hexdigest()
    )
    n = len(order)
    half = n // 2
    dists = []
    for i in range(half):
        qa = np.array(order[i][1])
        qb = np.array(order[i + half][1])
        d2 = int(((qa - qb) ** 2).sum())
        if d2 == 0:
            continue
        dy2 = int(((R @ (qa - qb)) ** 2).sum())
        dists.append(abs(1.0 - dy2 / (_JL_K * d2)))
    assert r["n_pairs"] == len(dists)
    assert abs(r["max_distortion"] - max(dists)) < 1e-6
    assert r["within_10pct"] == sum(1 for d in dists if d <= 0.1)
    assert r["within_25pct"] == sum(1 for d in dists if d <= 0.25)
    assert r["within_50pct"] == sum(1 for d in dists if d <= 0.5)
    assert (
        r["within_10pct"] <= r["within_25pct"]
        <= r["within_50pct"] <= r["n_pairs"]
    )


def test_pr_curve_ap_rebuild(spark):
    """AP and the best-F1 operating point vs a literal python sweep of
    every threshold (sklearn step-AP convention), plus the bound
    AP <= 1 and the F1 harmonic identity at the chosen point."""
    from collections import defaultdict

    from mpds_spark.queries import q_pr_curve_ap

    r = q_pr_curve_ap(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(n_chars AS BIGINT),"
        " CASE WHEN length(text) - length(replace(text,' ','')) + 1 >= 20"
        " THEN 1 ELSE 0 END FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    hist = defaultdict(lambda: [0, 0])
    for v, y in rows:
        hist[v][y] += 1
    vs = sorted(hist, reverse=True)
    P = sum(hist[v][1] for v in vs)
    N = sum(hist[v][0] for v in vs)
    tp = fp = 0
    ap = 0.0
    best = None
    for v in vs:
        tp += hist[v][1]
        fp += hist[v][0]
        prec = tp / (tp + fp)
        ap += (hist[v][1] / P) * prec
        f1 = 2 * tp / (2 * tp + fp + (P - tp))
        key = (-f1, v)
        if best is None or key < best[0]:
            best = (key, v, f1, prec, tp / P)
    _, bv, bf1, bprec, brec = best
    assert (r["n_docs"], r["n_pos"]) == (P + N, P)
    assert abs(r["average_precision"] - ap) < 1e-5
    assert r["average_precision"] <= 1.0 + 1e-12
    assert r["best_f1_threshold"] == bv
    assert abs(r["best_f1"] - bf1) < 1e-6
    assert abs(r["precision_at_best"] - bprec) < 1e-6
    assert abs(r["recall_at_best"] - brec) < 1e-6
    p_, rcl = r["precision_at_best"], r["recall_at_best"]
    assert abs(r["best_f1"] - 2 * p_ * rcl / (p_ + rcl)) < 1e-5


def test_seasonal_strength_rebuild(spark):
    """eta^2 and per-dow means vs a literal python one-way variance
    decomposition, the ANOVA identity SSB <= SST, and strength in
    [0, 1]."""
    from collections import defaultdict

    from mpds_spark.queries import q_seasonal_strength

    rows = {
        r["dow"]: r
        for r in q_seasonal_strength(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    raw = duckdb.sql(
        "SELECT CAST(ts AS DATE), dayofweek(ts) + 1, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per = defaultdict(list)
    for _, dow, c in raw:
        per[dow].append(c)
    allv = [c for v in per.values() for c in v]
    n = len(allv)
    gm = sum(allv) / n
    sst = sum((y - gm) ** 2 for y in allv)
    ssb = sum(
        len(v) * (sum(v) / len(v) - gm) ** 2 for v in per.values()
    )
    for dow, v in per.items():
        r = rows[dow]
        assert r["n_days"] == len(v)
        assert abs(r["mean_volume"] - sum(v) / len(v)) < 1e-6
        assert abs(r["sst"] - sst) < 1e-3
        assert abs(r["ssb"] - ssb) < 1e-3
        assert abs(r["seasonal_strength"] - ssb / sst) < 1e-6
        assert 0.0 <= r["seasonal_strength"] <= 1.0
        assert r["ssb"] <= r["sst"] + 1e-9


def test_cochran_q_rebuild_and_mcnemar_reduction(spark):
    """Q vs a literal python computation over per-doc rule triples,
    and the k=2 reduction identity: Cochran's Q restricted to the
    (len120, words20) pair equals McNemar's UNcorrected chi-square
    on the same raters (textbook equivalence)."""
    from mpds_spark.queries import (
        _CQ_RULES,
        q_cochran_q,
        q_mcnemar_test,
    )

    r = q_cochran_q(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CASE WHEN n_chars >= 120 THEN 1 ELSE 0 END,"
        " CASE WHEN length(text) - length(replace(text,' ','')) + 1"
        " >= 20 THEN 1 ELSE 0 END,"
        " CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    k = 3
    cj = [sum(t[j] for t in rows) for j in range(k)]
    t_tot = sum(cj)
    r2 = sum(sum(t) ** 2 for t in rows)
    q = (
        k * (k - 1) * sum((c - t_tot / k) ** 2 for c in cj)
        / (k * t_tot - r2)
    )
    assert r["n_docs"] == len(rows)
    assert r["n_passes"] == t_tot
    assert (r["pass_len120"], r["pass_words20"], r["pass_len200"]) \
        == tuple(cj)
    assert abs(r["cochran_q"] - q) < 1e-4
    assert r["rules_differ"] == (q > 5.991)
    # k=2 reduction: Q(pair) == McNemar uncorrected chi2
    b = sum(1 for t in rows if t[0] == 1 and t[1] == 0)
    c = sum(1 for t in rows if t[0] == 0 and t[1] == 1)
    if b + c > 0:
        q2 = 2 * 1 * (
            ((b - c) / 2) ** 2 + ((c - b) / 2) ** 2
        ) / (b + c)
        mn = q_mcnemar_test(spark, "/root/testdata/sf0.001").collect()[0]
        assert abs(q2 - mn["chi2"]) < 1e-6


def test_capture_recapture_rebuild(spark):
    """Capture cells vs a literal python split of the month, the
    Chapman estimate/SE formulas, and the closed-population sanity
    that the estimate lands within a few SE of the true count on
    identity-stable data."""
    from collections import defaultdict

    from mpds_spark.queries import q_capture_recapture

    r = q_capture_recapture(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    raw = duckdb.sql(
        "SELECT user_id, min(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0"
        " END) IS NOT NULL,"
        " max(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END),"
        " max(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.001/events.parquet' GROUP BY user_id"
    ).fetchall()
    n_true = len(raw)
    n1 = sum(t[2] for t in raw)
    n2 = sum(t[3] for t in raw)
    m = sum(1 for t in raw if t[2] and t[3])
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    var = (
        (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
        / ((m + 1) ** 2 * (m + 2))
    )
    assert (r["n_true"], r["n1"], r["n2"], r["m"]) == (
        n_true, n1, n2, m,
    )
    assert abs(r["chapman_estimate"] - est) < 1e-4
    assert abs(r["se"] - var ** 0.5) < 1e-4
    assert abs(r["chapman_estimate"] - n_true) \
        <= max(4 * r["se"], 0.1 * n_true)


def test_odds_ratio_ci_rebuild(spark):
    """Cells and the Woolf interval vs a literal python rebuild, the
    CI-contains-point-estimate invariant, and consistency between
    the significance flag and the interval."""
    import math

    from mpds_spark.queries import q_odds_ratio_ci

    r = q_odds_ratio_ci(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    a, b, c, d = duckdb.sql(
        "SELECT"
        " sum(CASE WHEN dayofweek(ts) IN (0,6) AND event_type ="
        " 'purchase' THEN 1 ELSE 0 END),"
        " sum(CASE WHEN dayofweek(ts) IN (0,6) AND event_type <>"
        " 'purchase' THEN 1 ELSE 0 END),"
        " sum(CASE WHEN dayofweek(ts) NOT IN (0,6) AND event_type ="
        " 'purchase' THEN 1 ELSE 0 END),"
        " sum(CASE WHEN dayofweek(ts) NOT IN (0,6) AND event_type <>"
        " 'purchase' THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    orr = a * d / (b * c)
    se = (1 / a + 1 / b + 1 / c + 1 / d) ** 0.5
    lo = math.exp(math.log(orr) - 1.96 * se)
    hi = math.exp(math.log(orr) + 1.96 * se)
    assert abs(r["odds_ratio"] - orr) < 1e-5
    assert abs(r["se_log_or"] - se) < 1e-6
    assert abs(r["or_lo95"] - lo) < 1e-5
    assert abs(r["or_hi95"] - hi) < 1e-5
    assert r["or_lo95"] < r["odds_ratio"] < r["or_hi95"]
    assert r["significant"] == (lo > 1.0 or hi < 1.0)


def test_kpss_rebuild(spark):
    """KPSS statistic vs a literal python rebuild (demeaned
    residuals, partial sums, Bartlett long-run variance at
    Schwert's lag) plus the internal identities: the lag formula,
    s2_long collapsing to s2_short when all autocovariance weights
    were zeroed, and the reject flag against the pinned 0.463."""
    from mpds_spark.queries import q_kpss_test

    r = q_kpss_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    X = sum(ys)
    e = [(n * y - X) / n for y in ys]
    cum = 0.0
    ss = 0.0
    cy = 0
    for t, y in enumerate(ys, start=1):
        cy += y
        s = (n * cy - t * X) / n
        ss += s * s
    lag = int(4.0 * ((n / 100.0) ** 0.25))
    g0 = sum(x * x for x in e)
    s2 = g0 / n
    for j in range(1, lag + 1):
        gj = sum(e[i] * e[i - j] for i in range(j, n))
        s2 += 2.0 * (1.0 - j / (lag + 1)) * gj / n
    stat = ss / (n * s2)
    assert r["n_days"] == n
    assert r["lag_l"] == lag
    assert abs(r["s2_short"] - g0 / n) < 1e-4
    assert abs(r["s2_long"] - s2) < 1e-4
    assert abs(r["kpss_stat"] - stat) < 1e-6
    assert r["reject_5pct"] == (stat > 0.463)
    assert r["s2_long"] > 0.0


def test_mantel_haenszel_rebuild(spark):
    """MH pooled OR, RBG variance and CMH chi2 vs a literal python
    rebuild of the 7 day-of-week 2x2 tables under the same md5
    parity arms, plus the CI-contains-point invariant and the
    significance flag consistency."""
    import hashlib
    import math
    from collections import defaultdict

    from mpds_spark.queries import q_mantel_haenszel

    r = q_mantel_haenszel(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT dayofweek(ts), user_id, event_type = 'purchase'"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for k, uid, pur in rows:
        h = hashlib.md5(f"mh|{uid}".encode()).hexdigest()
        arm = int(h[:15], 16) % 2
        idx = (0 if pur else 1) if arm == 1 else (2 if pur else 3)
        cells[k][idx] += 1
    R = S = E = V = PR = PSQR = QS = 0.0
    sum_a = 0
    for k in sorted(cells):
        a, b, c, d = cells[k]
        nn = a + b + c + d
        sum_a += a
        R += a * d / nn
        S += b * c / nn
        E += (a + b) * (a + c) / nn
        if nn > 1:
            V += (
                (a + b) * (c + d) * (a + c) * (b + d)
                / (nn * nn * (nn - 1))
            )
        PR += ((a + d) / nn) * (a * d / nn)
        PSQR += ((a + d) / nn) * (b * c / nn) \
            + ((b + c) / nn) * (a * d / nn)
        QS += ((b + c) / nn) * (b * c / nn)
    orr = R / S
    se = math.sqrt(
        PR / (2 * R * R) + PSQR / (2 * R * S) + QS / (2 * S * S)
    )
    chi2 = (sum_a - E) ** 2 / V
    assert r["k_strata"] == len(cells)
    assert r["sum_a"] == sum_a
    assert abs(r["or_mh"] - orr) < 1e-6
    assert abs(r["se_log_or"] - se) < 1e-6
    assert abs(r["cmh_chi2"] - chi2) < 1e-5
    assert r["or_lo95"] < r["or_mh"] < r["or_hi95"]
    assert r["significant"] == (
        r["or_lo95"] > 1.0 or r["or_hi95"] < 1.0
    )


def test_variance_ratio_rebuild(spark):
    """VR(q) and z(q) vs a literal python rebuild of the
    Lo-MacKinlay overlapping estimator (with x_0 = 0 and the
    unbiased-overlapping denominator), plus the internal
    identities VR -> 1 consistency of the reject flag and the
    q-row coverage."""
    from mpds_spark.queries import q_variance_ratio

    rows = {
        r["q"]: r
        for r in q_variance_ratio(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    X = sum(ys)
    mu = X / n
    xs = [0]
    for y in ys:
        xs.append(xs[-1] + y)
    s1 = sum((y - mu) ** 2 for y in ys) / (n - 1)
    for q in (2, 3, 5):
        m = q * (n - q + 1) * (1 - q / n)
        sq = sum(
            (xs[t] - xs[t - q] - q * mu) ** 2
            for t in range(q, n + 1)
        ) / m
        vr = sq / s1
        z = (vr - 1) / (
            (2 * (2 * q - 1) * (q - 1) / (3 * q * n)) ** 0.5
        )
        r = rows[q]
        assert r["n_days"] == n
        assert abs(r["vr"] - vr) < 1e-6
        assert abs(r["z_stat"] - z) < 1e-5
        assert r["reject_5pct"] == (abs(z) > 1.96)
    assert set(rows) == {2, 3, 5}


def test_granger_rebuild(spark):
    """Both Granger directions vs numpy lstsq fits of the
    restricted/unrestricted lag-1 regressions (the moment-identity
    SSEs must match the residual-sum definition) and the F-statistic
    formula."""
    import numpy as np

    from mpds_spark.queries import q_granger_causality

    rows = {
        r["direction"]: r
        for r in q_granger_causality(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    day = duckdb.sql(
        "SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0"
        " END), sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    p = np.array([t[0] for t in day], dtype=float)
    c = np.array([t[1] for t in day], dtype=float)
    for label, z, cl in (
        ("clicks->purchases", p, c),
        ("purchases->clicks", c, p),
    ):
        zt, ol, clg = z[1:], z[:-1], cl[:-1]
        nu = len(zt)
        Xr = np.column_stack([np.ones(nu), ol])
        Xu = np.column_stack([np.ones(nu), ol, clg])
        br, *_ = np.linalg.lstsq(Xr, zt, rcond=None)
        bu, *_ = np.linalg.lstsq(Xu, zt, rcond=None)
        sse_r = float(np.sum((zt - Xr @ br) ** 2))
        sse_u = float(np.sum((zt - Xu @ bu) ** 2))
        f = (sse_r - sse_u) * (nu - 3) / sse_u
        r = rows[label]
        assert r["n_used"] == nu
        assert abs(r["b_own_lag"] - bu[1]) < 1e-6
        assert abs(r["b_cross_lag"] - bu[2]) < 1e-6
        assert abs(r["sse_restricted"] - sse_r) < 1e-3
        assert abs(r["sse_unrestricted"] - sse_u) < 1e-3
        assert abs(r["f_stat"] - f) < 1e-4
        assert r["reject_approx_5pct"] == (r["f_stat"] > 4.21)


def test_durbin_watson_rebuild(spark):
    """DW statistic vs a literal python rebuild of the
    trend-residual autocorrelation test (OLS of daily counts on
    t = 1..n, first-difference ratio on the residuals), plus the
    rho_hat identity and the Savin-White verdict banding."""
    from mpds_spark.queries import q_durbin_watson

    r = q_durbin_watson(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    ts = list(range(1, n + 1))
    tbar = sum(ts) / n
    ybar = sum(ys) / n
    sxy = sum((t - tbar) * (y - ybar) for t, y in zip(ts, ys))
    sxx = sum((t - tbar) ** 2 for t in ts)
    b = sxy / sxx
    a = ybar - b * tbar
    e = [y - a - b * t for t, y in zip(ts, ys)]
    num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    den = sum(x * x for x in e)
    dw = num / den
    assert r["n_days"] == n
    assert abs(r["slope_per_day"] - b) < 1e-6
    assert abs(r["dw"] - dw) < 1e-6
    assert abs(r["rho_hat"] - (1.0 - dw / 2.0)) < 1e-6
    if dw < 1.352:
        assert r["verdict"] == "positive_autocorr"
    elif dw > 2.648:
        assert r["verdict"] == "negative_autocorr"
    elif 1.489 <= dw <= 2.511:
        assert r["verdict"] == "no_autocorr"
    else:
        assert r["verdict"] == "inconclusive"
    assert 0.0 < dw < 4.0


def test_bartlett_rebuild(spark):
    """Bartlett T vs a literal python rebuild over the 5 per-type
    sample variances of value (exact cents), plus the
    Snedecor-Cochran correction factor and pooled-variance
    identities and the chi2(4) reject flag."""
    import math

    from mpds_spark.queries import q_bartlett_test

    r = q_bartlett_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    from collections import defaultdict

    g = defaultdict(list)
    for et, c in rows:
        g[et].append(c)
    k = len(g)
    N = sum(len(v) for v in g.values())
    W = 0.0
    LNS = 0.0
    IN = 0.0
    for et in sorted(g):
        cs = g[et]
        ni = len(cs)
        m = sum(cs) / ni
        w = sum((c - m) ** 2 for c in cs) / 1e4
        s2 = w / (ni - 1)
        W += w
        LNS += (ni - 1) * math.log(s2)
        IN += 1.0 / (ni - 1)
    nk = N - k
    sp2 = W / nk
    cf = 1.0 + (IN - 1.0 / nk) / (3.0 * (k - 1))
    t = (nk * math.log(sp2) - LNS) / cf
    assert r["k_groups"] == k
    assert r["n_total"] == N
    assert abs(r["pooled_var"] - sp2) < 1e-4
    assert abs(r["c_factor"] - cf) < 1e-6
    assert abs(r["bartlett_t"] - t) < 1e-4
    assert r["reject_5pct"] == (t > 9.488)
    assert r["c_factor"] > 1.0


def test_breusch_pagan_rebuild(spark):
    """Koenker-form BP LM vs a literal python rebuild: OLS of daily
    counts on t = 1..n, then the auxiliary regression of the squared
    residuals on t; LM = n * R^2, chi2(1) banding at 3.841."""
    from mpds_spark.queries import q_breusch_pagan

    r = q_breusch_pagan(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    ts = list(range(1, n + 1))
    tbar = sum(ts) / n
    ybar = sum(ys) / n
    b = sum((t - tbar) * (y - ybar) for t, y in zip(ts, ys)) / sum(
        (t - tbar) ** 2 for t in ts
    )
    a = ybar - b * tbar
    g = [(y - a - b * t) ** 2 for t, y in zip(ts, ys)]
    gbar = sum(g) / n
    sxy = sum((t - tbar) * (gi - gbar) for t, gi in zip(ts, g))
    sxx = sum((t - tbar) ** 2 for t in ts)
    syy = sum((gi - gbar) ** 2 for gi in g)
    r2 = sxy * sxy / (sxx * syy)
    lm = n * r2
    assert r["n_days"] == n
    assert abs(r["r2_aux"] - r2) < 1e-6
    assert abs(r["bp_lm"] - lm) < 1e-5
    assert r["reject_5pct"] == (lm > 3.841)
    if sxy > 0:
        assert r["direction"] == "variance_increasing"
    elif sxy < 0:
        assert r["direction"] == "variance_decreasing"
    assert 0.0 <= r["r2_aux"] <= 1.0


def test_cronbach_alpha_rebuild(spark):
    """Cronbach's alpha vs a literal python rebuild over the day x
    event-type count matrix (sample variances, k/(k-1) form), plus
    the variance-decomposition identity total_var =
    sum_item_var + 2*sum_of_item_covariances (checked implicitly via
    the alpha formula) and the Nunnally 0.7 flag."""
    from mpds_spark.queries import q_cronbach_alpha

    r = q_cronbach_alpha(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), event_type, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1, 2"
    ).fetchall()
    types = ["click", "error", "purchase", "signup", "view"]
    days = sorted({d for d, _, _ in rows})
    mat = {d: {t: 0 for t in types} for d in days}
    for d, t, c in rows:
        mat[d][t] = c
    n = len(days)

    def svar(xs):
        m = sum(xs) / n
        return sum((x - m) ** 2 for x in xs) / (n - 1)

    item_vars = [svar([mat[d][t] for d in days]) for t in types]
    tot = [sum(mat[d][t] for t in types) for d in days]
    vt = svar(tot)
    k = len(types)
    alpha = k / (k - 1) * (1.0 - sum(item_vars) / vt)
    assert r["k_items"] == k
    assert r["n_days"] == n
    assert abs(r["sum_item_var"] - sum(item_vars)) < 1e-6
    assert abs(r["total_var"] - vt) < 1e-6
    assert abs(r["alpha"] - alpha) < 1e-6
    assert r["acceptable"] == (alpha >= 0.7)
    assert r["alpha"] <= 1.25


def test_pettitt_rebuild(spark):
    """Pettitt K/U_t vs a literal python rebuild of the rank
    change-point statistic over the daily counts, plus the
    earliest-t tie-break, the approximate p formula and the
    direction banding."""
    import math

    from mpds_spark.queries import q_pettitt_test

    r = q_pettitt_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    days = [d for d, _ in rows]
    ys = [c for _, c in rows]
    n = len(ys)

    def sgn(v):
        return (v > 0) - (v < 0)

    us = []
    for t in range(1, n):
        us.append(
            sum(
                sgn(ys[j] - ys[i])
                for i in range(t)
                for j in range(t, n)
            )
        )
    k = max(abs(u) for u in us)
    tstar = next(i for i, u in enumerate(us) if abs(u) == k)
    p = 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2))
    assert r["n_days"] == n
    assert r["k_stat"] == k
    assert r["change_day"] == days[tstar]
    assert r["u_at_k"] == us[tstar]
    assert abs(r["p_approx"] - p) < 1e-6
    assert r["significant_5pct"] == (p < 0.05)
    assert r["direction"] == (
        "upward_shift" if us[tstar] > 0 else "downward_shift"
    )


def test_cliffs_delta_rebuild(spark):
    """Cliff's delta vs a literal python brute-force over all
    cross-arm value pairs at sf0.001 (the query computes the same
    quantity via the distinct-cents cumulative frame), plus the
    P + Q + T = m*n identity, the probability-of-superiority
    formula and the Romano banding."""
    import hashlib

    from mpds_spark.queries import q_cliffs_delta

    r = q_cliffs_delta(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()

    def arm(uid):
        h = hashlib.md5(f"cd|{uid}".encode()).hexdigest()[:15]
        return int(h, 16) % 2

    a = sorted(c for u, c in rows if arm(u) == 1)
    b = sorted(c for u, c in rows if arm(u) == 0)
    m, n = len(a), len(b)
    import bisect

    p = sum(bisect.bisect_left(b, x) for x in a)
    t = sum(
        bisect.bisect_right(b, x) - bisect.bisect_left(b, x)
        for x in a
    )
    q = m * n - p - t
    delta = (p - q) / (m * n)
    assert r["n_arm1"] == m
    assert r["n_arm0"] == n
    assert r["gt_pairs"] == p
    assert r["lt_pairs"] == q
    assert r["tie_pairs"] == t
    assert abs(r["cliffs_delta"] - delta) < 1e-6
    assert abs(r["p_superiority"] - (2 * p + t) / (2 * m * n)) < 1e-6
    ad = abs(delta)
    band = (
        "negligible" if ad < 0.147
        else "small" if ad < 0.33
        else "medium" if ad < 0.474
        else "large"
    )
    assert r["band"] == band
    # hash-random A/A arms: the effect must be negligible
    assert r["band"] == "negligible"


def test_grubbs_rebuild(spark):
    """Grubbs G vs a literal python rebuild (max studentized
    deviation of the daily counts, sample sd), plus the earliest-day
    argmax tie-break, the NIST 2.908 banding and the side flag."""
    from mpds_spark.queries import q_grubbs_test

    r = q_grubbs_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    days = [d for d, _ in rows]
    ys = [c for _, c in rows]
    n = len(ys)
    m = sum(ys) / n
    s = (sum((y - m) ** 2 for y in ys) / (n - 1)) ** 0.5
    devs = [abs(y - m) for y in ys]
    g = max(devs) / s
    i = devs.index(max(devs))
    assert r["n_days"] == n
    assert r["outlier_day"] == days[i]
    assert r["outlier_value"] == ys[i]
    assert abs(r["mean_volume"] - m) < 1e-6
    assert abs(r["sd_volume"] - s) < 1e-6
    assert abs(r["g_stat"] - g) < 1e-6
    assert r["reject_5pct"] == (g > 2.908)
    assert r["side"] == ("high" if ys[i] > m else "low")
    assert r["g_stat"] > 0


def test_taylor_law_rebuild(spark):
    """Taylor exponent vs a literal python rebuild: per-hour-of-day
    mean/variance of the daily counts (zero days included via the
    n_days denominator), log-log OLS, r^2 and the banding."""
    import math

    from mpds_spark.queries import q_taylor_law

    r = q_taylor_law(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), hour(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY 1, 2"
    ).fetchall()
    days = sorted({d for d, _, _ in rows})
    nd = len(days)
    pts = []
    for h in range(24):
        cs = {d: 0 for d in days}
        for d, hh, c in rows:
            if hh == h:
                cs[d] = c
        vals = [cs[d] for d in days]
        s = sum(vals)
        q = sum(v * v for v in vals)
        if s > 0 and nd * q - s * s > 0:
            mean = s / nd
            var = (nd * q - s * s) / (nd * (nd - 1))
            pts.append((math.log(mean), math.log(var)))
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    dxy = k * sxy - sx * sy
    dxx = k * sxx - sx * sx
    dyy = k * syy - sy * sy
    b = dxy / dxx
    assert r["n_days"] == nd
    assert r["n_hours"] == k
    assert abs(r["taylor_b"] - b) < 1e-6
    assert abs(r["ln_a"] - (sy - b * sx) / k) < 1e-6
    assert abs(r["r2"] - dxy * dxy / (dxx * dyy)) < 1e-6
    band = (
        "aggregated" if b > 1.2
        else "underdispersed" if b < 0.8
        else "poisson_like"
    )
    assert r["verdict"] == band
    assert 0.0 <= r["r2"] <= 1.0


def test_sample_entropy_rebuild(spark):
    """SampEn(m=2, r=0.5*SD) vs a literal python rebuild of the
    Richman-Moorman template counts over the daily volumes, plus
    A <= B and the banding."""
    import math

    from mpds_spark.queries import q_sample_entropy

    r = q_sample_entropy(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    m = sum(ys) / n
    sd = (sum((y - m) ** 2 for y in ys) / (n - 1)) ** 0.5
    tol = 0.5 * sd
    M = n - 2
    b = a = 0
    for i in range(M - 1):
        for j in range(i + 1, M):
            if (
                abs(ys[i] - ys[j]) <= tol
                and abs(ys[i + 1] - ys[j + 1]) <= tol
            ):
                b += 1
                if abs(ys[i + 2] - ys[j + 2]) <= tol:
                    a += 1
    sampen = math.log(b) - math.log(a)
    assert r["n_days"] == n
    assert abs(r["r_tol"] - tol) < 1e-6
    assert r["b_count"] == b
    assert r["a_count"] == a
    assert r["a_count"] <= r["b_count"]
    assert abs(r["sampen"] - sampen) < 1e-6
    band = (
        "regular" if sampen < 0.5
        else "complex" if sampen > 1.5
        else "moderate"
    )
    assert r["band"] == band
    assert r["sampen"] > 0


def test_spectral_entropy_rebuild(spark):
    """Spectral entropy/flatness vs a literal numpy rebuild of the
    demeaned half-spectrum periodogram of the daily volumes, plus
    the [0,1] entropy range and flatness <= 1."""
    import math

    from mpds_spark.queries import q_spectral_entropy

    r = q_spectral_entropy(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    mfr = (n - 1) // 2
    s = sum(ys)
    ps = []
    for k in range(1, mfr + 1):
        c = sum(
            (n * ys[t - 1] - s)
            * math.cos(2 * math.pi * k * t / n)
            for t in range(1, n + 1)
        )
        si = sum(
            (n * ys[t - 1] - s)
            * math.sin(2 * math.pi * k * t / n)
            for t in range(1, n + 1)
        )
        ps.append(c * c + si * si)
    tot = sum(ps)
    h = -sum(
        (p / tot) * math.log(p / tot) for p in ps if p > 0
    ) / math.log(mfr)
    lnf = sum(math.log(p) for p in ps) / mfr
    flat = math.exp(lnf) / (tot / mfr)
    assert r["n_days"] == n
    assert r["n_freqs"] == mfr
    assert abs(r["spectral_entropy"] - h) < 1e-6
    assert abs(r["spectral_flatness"] - flat) < 1e-6
    assert 0.0 <= r["spectral_entropy"] <= 1.0
    assert 0.0 < r["spectral_flatness"] <= 1.0
    band = (
        "broadband_noise" if h > 0.9
        else "strongly_periodic" if h < 0.6
        else "mixed"
    )
    assert r["band"] == band


def test_adamic_adar_rebuild(spark):
    """Top-12 AA pairs vs a literal python rebuild over the co-order
    part graph (wedge enumeration, non-edge filter, 1/ln(deg)
    weights), plus the ordering contract and the common-neighbor
    consistency."""
    import math
    from collections import defaultdict

    from mpds_spark.queries import q_adamic_adar

    rows = q_adamic_adar(spark, "/root/testdata/sf0.001").collect()
    import duckdb

    li = duckdb.sql(
        "SELECT DISTINCT l_orderkey, l_partkey FROM"
        " '/root/testdata/sf0.001/lineitem.parquet'"
        " WHERE l_partkey % 4 = 0"
    ).fetchall()
    baskets = defaultdict(set)
    for ok, pk in li:
        baskets[ok].add(pk)
    edges = set()
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                edges.add((s[i], s[j]))
    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    cand = {}
    for z, ns in nbr.items():
        dz = len(nbr[z])
        s = sorted(ns)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                x, y = s[i], s[j]
                if (x, y) in edges:
                    continue
                c, w = cand.get((x, y), (0, 0.0))
                cand[(x, y)] = (c + 1, w + 1.0 / math.log(dz))
    top = sorted(
        cand.items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:12]
    assert len(rows) == 12
    got = [(r["part_a"], r["part_b"]) for r in rows]
    assert got == [k for k, _ in top]
    for r, (k, (c, w)) in zip(rows, top):
        assert r["common_neighbors"] == c
        assert abs(r["aa"] - w) < 1e-6
        assert (k[0], k[1]) not in edges


def test_hits_rebuild(spark):
    """Exact-integer HITS path counts vs a literal python rebuild of
    two full sweeps on the customer->part graph, plus the round-1
    identity (authority = in-degree) and the max-normalization."""
    from collections import defaultdict

    from mpds_spark.queries import q_hits_scores

    rows = q_hits_scores(spark, "/root/testdata/sf0.001").collect()
    import duckdb

    ed = duckdb.sql(
        "SELECT DISTINCT o_custkey, l_partkey FROM"
        " '/root/testdata/sf0.001/orders.parquet' o JOIN"
        " '/root/testdata/sf0.001/lineitem.parquet' l"
        " ON o.o_orderkey = l.l_orderkey WHERE l_partkey % 4 = 0"
    ).fetchall()
    out_e = defaultdict(list)
    in_e = defaultdict(list)
    for c, p in ed:
        out_e[c].append(p)
        in_e[p].append(c)
    h = {c: 1 for c in out_e}
    for _ in range(2):
        a = {p: sum(h[c] for c in in_e[p]) for p in in_e}
        h = {c: sum(a[p] for p in out_e[c]) for c in out_e}
    am = max(a.values())
    hm = max(h.values())
    top_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    auth_rows = [r for r in rows if r["side"] == "authority"]
    hub_rows = [r for r in rows if r["side"] == "hub"]
    assert [(r["node"], r["score"]) for r in auth_rows] == top_a
    assert [(r["node"], r["score"]) for r in hub_rows] == top_h
    for r in auth_rows:
        assert abs(r["score_norm"] - r["score"] / am) < 1e-6
    for r in hub_rows:
        assert abs(r["score_norm"] - r["score"] / hm) < 1e-6
    assert auth_rows[0]["score_norm"] == 1.0
    assert hub_rows[0]["score_norm"] == 1.0


def test_ndcg_rebuild(spark):
    """nDCG@10 vs a literal python rebuild of the temporal-split
    part ranking (first-period revenue ranks, second-period revenue
    relevance, log2 discounts), plus DCG <= IDCG and the overlap
    count."""
    import math
    from collections import defaultdict

    from mpds_spark.queries import q_ndcg_eval

    r = q_ndcg_eval(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT l_partkey, o_orderdate,"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/lineitem.parquet' l JOIN"
        " '/root/testdata/sf0.001/orders.parquet' o"
        " ON l_orderkey = o_orderkey"
    ).fetchall()
    import datetime

    split = datetime.datetime(1998, 7, 1)
    r1 = defaultdict(int)
    r2 = defaultdict(int)
    parts = set()
    for p, d, c in rows:
        parts.add(p)
        if d < split:
            r1[p] += c
        else:
            r2[p] += c
    train = sorted(
        [p for p in parts if r1[p] > 0], key=lambda p: (-r1[p], p)
    )[:10]
    ideal = sorted(parts, key=lambda p: (-r2[p], p))[:10]

    def dcg(ps):
        return sum(
            (r2[p] / 100.0) / (math.log(i + 2) / math.log(2))
            for i, p in enumerate(ps)
        )

    d, di = dcg(train), dcg(ideal)
    assert r["k"] == 10
    assert r["n_parts"] == len(parts)
    assert abs(r["dcg"] - d) < 1e-6
    assert abs(r["idcg"] - di) < 1e-6
    assert abs(r["ndcg"] - d / di) < 1e-6
    assert r["dcg"] <= r["idcg"] + 1e-9
    assert r["top10_overlap"] == len(set(train) & set(ideal))
    assert 0.0 <= r["ndcg"] <= 1.0


def test_mrr_rebuild(spark):
    """MRR@20 vs a literal python rebuild of the per-customer
    temporal-split ranking eval, plus the hits@k monotonicity and
    hit-rate consistency."""
    from collections import defaultdict

    from mpds_spark.queries import q_mrr_eval

    r = q_mrr_eval(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT o_custkey, l_partkey, o_orderdate,"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/lineitem.parquet' l JOIN"
        " '/root/testdata/sf0.001/orders.parquet' o"
        " ON l_orderkey = o_orderkey"
    ).fetchall()
    import datetime

    split = datetime.datetime(1998, 7, 1)
    c1 = defaultdict(int)
    c2 = defaultdict(int)
    for u, p, d, c in rows:
        if d < split:
            c1[(u, p)] += c
        else:
            c2[(u, p)] += c
    users = sorted({u for u, _ in list(c1) + list(c2)})
    ranks = []
    for u in users:
        tgts = [(v, p) for (uu, p), v in c2.items()
                if uu == u and v > 0]
        if not tgts:
            continue
        tp = max(tgts, key=lambda t: (t[0], -t[1]))[1]
        fh = sorted(
            [(v, p) for (uu, p), v in c1.items()
             if uu == u and v > 0],
            key=lambda t: (-t[0], t[1]),
        )
        rank = 0
        for i, (_, p) in enumerate(fh, start=1):
            if p == tp:
                rank = i
                break
        if rank > 20:
            rank = 0
        ranks.append(rank)
    n = len(ranks)
    mrr = sum(1.0 / x for x in ranks if x >= 1) / n
    assert r["n_users"] == n
    assert r["hits_at_1"] == sum(1 for x in ranks if x == 1)
    assert r["hits_at_5"] == sum(1 for x in ranks if 1 <= x <= 5)
    assert r["hits_at_10"] == sum(1 for x in ranks if 1 <= x <= 10)
    assert r["hits_at_1"] <= r["hits_at_5"] <= r["hits_at_10"]
    assert abs(
        r["hit_rate"] - sum(1 for x in ranks if x >= 1) / n
    ) < 1e-6
    assert abs(r["mrr"] - mrr) < 1e-6
    assert 0.0 <= r["mrr"] <= 1.0


def test_brier_decomposition_rebuild(spark):
    """Murphy REL/RES/UNC vs a literal python rebuild over the 10
    score bins, plus the exact identity B_binned = REL - RES + UNC
    against a direct binned-forecast Brier computation and the BSS
    consistency."""
    from collections import defaultdict

    from mpds_spark.queries import q_brier_decomposition

    r = q_brier_decomposition(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT least(n_chars, 400),"
        " CASE WHEN length(text) - length(replace(text, ' ', ''))"
        " + 1 >= 50 THEN 1 ELSE 0 END"
        " FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    bins = defaultdict(lambda: [0, 0, 0])
    for m, y in rows:
        b = min(9, m // 40)
        bins[b][0] += 1
        bins[b][1] += y
        bins[b][2] += m
    N = sum(v[0] for v in bins.values())
    P = sum(v[1] for v in bins.values())
    ybar = P / N
    rel = sum(
        n * ((sm / (400 * n)) - pos / n) ** 2
        for n, pos, sm in bins.values()
    ) / N
    res = sum(
        n * (pos / n - ybar) ** 2 for n, pos, _ in bins.values()
    ) / N
    unc = ybar * (1 - ybar)
    # direct binned-forecast Brier: every doc in bin b forecasts the
    # bin's mean score sm/(400 n)
    direct = sum(
        (sm / (400 * n)) ** 2 * n
        - 2 * (sm / (400 * n)) * pos
        + pos
        for n, pos, sm in bins.values()
    ) / N
    assert r["n_bins"] == len(bins)
    assert r["n_docs"] == N
    assert abs(r["base_rate"] - ybar) < 1e-6
    assert abs(r["reliability"] - rel) < 1e-6
    assert abs(r["resolution"] - res) < 1e-6
    assert abs(r["uncertainty"] - unc) < 1e-6
    assert abs(r["brier_binned"] - (rel - res + unc)) < 1e-6
    assert abs((rel - res + unc) - direct) < 1e-12
    assert abs(r["bss"] - (1 - (rel - res + unc) / unc)) < 1e-5
    assert r["reliability"] >= 0 and r["resolution"] >= 0


def test_youden_rebuild(spark):
    """Youden J* vs a literal python sweep over all 401 thresholds,
    plus the lowest-threshold tie-break and the sens/spec identity."""
    from mpds_spark.queries import q_youden_j

    r = q_youden_j(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT least(n_chars, 400),"
        " CASE WHEN length(text) - length(replace(text, ' ', ''))"
        " + 1 >= 50 THEN 1 ELSE 0 END"
        " FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    N = len(rows)
    P = sum(y for _, y in rows)
    best = None
    for t in sorted({m for m, _ in rows}):
        tp = sum(1 for m, y in rows if m >= t and y == 1)
        fp = sum(1 for m, y in rows if m >= t and y == 0)
        jnum = tp * (N - P) - fp * P
        if best is None or jnum > best[0] or (
            jnum == best[0] and t < best[1]
        ):
            best = (jnum, t, tp, fp)
    jnum, t, tp, fp = best
    assert r["n_docs"] == N
    assert r["n_pos"] == P
    assert r["threshold"] == t
    assert r["tp"] == tp
    assert r["fp"] == fp
    assert abs(r["sensitivity"] - tp / P) < 1e-6
    assert abs(r["specificity"] - (1 - fp / (N - P))) < 1e-6
    assert abs(r["youden_j"] - jnum / (P * (N - P))) < 1e-6
    assert abs(
        r["youden_j"]
        - (r["sensitivity"] + r["specificity"] - 1.0)
    ) < 2e-6
    assert -1.0 <= r["youden_j"] <= 1.0


def test_lin_ccc_rebuild(spark):
    """Lin's CCC vs a literal python rebuild over the daily
    click/view pairs (1/n moment convention), plus |CCC| <= |r|,
    the C_b = CCC/r identity and the scale ratio."""
    from mpds_spark.queries import q_lin_ccc

    r = q_lin_ccc(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0"
        " END), sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    xs = [a for a, _ in rows]
    ys = [b for _, b in rows]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs) / n
    syy = sum((y - my) ** 2 for y in ys) / n
    sxy = sum(
        (x - mx) * (y - my) for x, y in zip(xs, ys)
    ) / n
    ccc = 2 * sxy / (sxx + syy + (mx - my) ** 2)
    pr = sxy / (sxx ** 0.5 * syy ** 0.5)
    assert r["n_days"] == n
    assert abs(r["mean_clicks"] - mx) < 1e-6
    assert abs(r["mean_views"] - my) < 1e-6
    assert abs(r["pearson_r"] - pr) < 1e-6
    assert abs(r["ccc"] - ccc) < 1e-6
    assert abs(r["c_b"] - ccc / pr) < 1e-5
    assert abs(r["scale_ratio"] - (sxx / syy) ** 0.5) < 1e-6
    assert abs(r["ccc"]) <= abs(r["pearson_r"]) + 1e-9
    assert r["interchangeable"] == (ccc > 0.9)


def test_bland_altman_rebuild(spark):
    """Bland-Altman bias/LoA vs a literal python rebuild over the
    daily click-view differences, plus the within-band count and the
    bias t-test flag."""
    from mpds_spark.queries import q_bland_altman

    r = q_bland_altman(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0"
        " END) - sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0"
        " END) FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    ds = [d for d, in rows]
    n = len(ds)
    mean = sum(ds) / n
    sd = (sum((d - mean) ** 2 for d in ds) / (n - 1)) ** 0.5
    lo, hi = mean - 1.96 * sd, mean + 1.96 * sd
    within = sum(1 for d in ds if lo <= d <= hi)
    assert r["n_days"] == n
    assert abs(r["bias"] - mean) < 1e-6
    assert abs(r["sd_diff"] - sd) < 1e-6
    assert abs(r["loa_lower"] - lo) < 1e-6
    assert abs(r["loa_upper"] - hi) < 1e-6
    assert r["n_within"] == within
    assert abs(r["pct_within"] - within / n) < 1e-6
    assert r["systematic_bias"] == (
        abs(mean / (sd / n ** 0.5)) > 1.96
    )
    assert r["loa_lower"] < r["loa_upper"]


def test_jensen_shannon_rebuild(spark):
    """JSD/TV vs a literal python rebuild over the 24x2 hour-arm
    histogram, plus the JSD <= 1 bit bound, TV exactness and the
    A/A consistency flag."""
    import hashlib
    import math
    from collections import defaultdict

    from mpds_spark.queries import q_jensen_shannon

    r = q_jensen_shannon(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb

    rows = duckdb.sql(
        "SELECT hour(ts), user_id FROM"
        " '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    cnt = defaultdict(lambda: [0, 0])
    for h, u in rows:
        arm = int(
            hashlib.md5(f"js|{u}".encode()).hexdigest()[:15], 16
        ) % 2
        cnt[h][0 if arm == 1 else 1] += 1
    A = sum(v[0] for v in cnt.values())
    B = sum(v[1] for v in cnt.values())
    tv = sum(
        abs(v[0] / A - v[1] / B) for v in cnt.values()
    ) / 2
    js = 0.0
    for v in cnt.values():
        p, q = v[0] / A, v[1] / B
        m = (p + q) / 2
        if p > 0:
            js += p / 2 * math.log(p / m)
        if q > 0:
            js += q / 2 * math.log(q / m)
    assert r["n_hours"] == len(cnt)
    assert r["n_arm1"] == A
    assert r["n_arm0"] == B
    assert abs(r["tv_dist"] - tv) < 1e-6
    assert abs(r["jsd_bits"] - js / math.log(2)) < 1e-6
    assert abs(r["js_metric"] - math.sqrt(js)) < 1e-6
    assert 0.0 <= r["jsd_bits"] <= 1.0
    assert r["arms_consistent"] == (js / math.log(2) < 0.01)


def test_hellinger_rebuild(spark):
    """BC/Hellinger vs a literal python rebuild, plus the
    H^2 <= TV <= H*sqrt(2) sandwich against the jensen_shannon
    query's exact TV and the argmax-gap hour."""
    import hashlib
    import math
    from collections import defaultdict

    from mpds_spark.queries import (
        q_hellinger_affinity,
        q_jensen_shannon,
    )

    r = q_hellinger_affinity(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    tv = q_jensen_shannon(spark, "/root/testdata/sf0.001").collect()[
        0
    ]["tv_dist"]
    import duckdb

    rows = duckdb.sql(
        "SELECT hour(ts), user_id FROM"
        " '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    cnt = defaultdict(lambda: [0, 0])
    for h, u in rows:
        arm = int(
            hashlib.md5(f"js|{u}".encode()).hexdigest()[:15], 16
        ) % 2
        cnt[h][0 if arm == 1 else 1] += 1
    A = sum(v[0] for v in cnt.values())
    B = sum(v[1] for v in cnt.values())
    bc = sum(
        math.sqrt(v[0] / A * v[1] / B) for v in cnt.values()
    )
    hd = math.sqrt(1 - bc)
    gaps = {
        h: abs(B * v[0] - A * v[1]) for h, v in cnt.items()
    }
    mg = max(gaps.values())
    mh = min(h for h, g in gaps.items() if g == mg)
    assert r["n_arm1"] == A and r["n_arm0"] == B
    assert abs(r["bhattacharyya"] - bc) < 1e-6
    assert abs(r["hellinger"] - hd) < 1e-6
    assert r["max_gap_hour"] == mh
    assert abs(r["max_gap"] - mg / (A * B)) < 1e-6
    # Hellinger-TV sandwich (Le Cam): H^2 <= TV <= H*sqrt(2)
    assert hd * hd <= tv + 1e-9
    assert tv <= hd * math.sqrt(2) + 1e-9
    assert r["arms_consistent"] == (hd < 0.1)


def test_moran_geary_rebuild(spark):
    """Moran I and Geary C vs literal python rebuilds on the circular
    hour-of-day histogram, plus the exact-integer scaling identity
    (z_h = n*y_h - S changes neither statistic) and the smooth-field
    complementarity reading."""
    from mpds_spark.queries import q_geary_c, q_moran_i

    ri = q_moran_i(spark, "/root/testdata/sf0.001").collect()[0]
    rc = q_geary_c(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY hour(ts) ORDER BY hour(ts)"
        ).fetchall()
    ]
    n = len(ys)
    m = sum(ys) / n
    z = [y - m for y in ys]
    den = sum(v * v for v in z)
    num_i = sum(z[i] * z[(i + 1) % n] for i in range(n))
    num_c = sum(
        (z[i] - z[(i + 1) % n]) ** 2 for i in range(n)
    )
    mi = num_i / den
    gc = (n - 1) * num_c / (2 * n * den)
    assert ri["n_cells"] == n and rc["n_cells"] == n
    assert abs(ri["moran_i"] - mi) < 1e-6
    assert abs(ri["expected_i"] - (-1 / (n - 1))) < 1e-6
    assert abs(rc["geary_c"] - gc) < 1e-6
    assert rc["expected_c"] == 1.0
    assert -1.1 <= ri["moran_i"] <= 1.1
    assert rc["geary_c"] >= 0.0
    # verdicts agree with the raw statistics
    if mi > 0:
        assert ri["verdict"] == "positive_autocorr"
    if gc < 1:
        assert rc["verdict"] == "positive_autocorr"


def test_croston_rebuild(spark):
    """Croston/SBA vs a literal python rebuild of the size/interval
    SES recursions over the thresholded purchase series, plus the
    Syntetos-Boylan taxonomy cell and the SBA = 0.9*Croston
    identity at alpha = 0.2."""
    from mpds_spark.queries import q_croston_forecast

    r = q_croston_forecast(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), sum(CASE WHEN event_type = 'purchase' AND"
        " value > 150 THEN 1 ELSE 0 END) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    n_days = len(rows)
    dem = [(d, z) for d, z in rows if z > 0]
    m = len(dem)
    zs = [float(z) for _, z in dem]
    ps = [float(dem[0][0])] + [
        float(dem[k][0] - dem[k - 1][0]) for k in range(1, m)
    ]

    def ses(xs, a=0.2):
        lvl = xs[0]
        for v in xs[1:]:
            lvl = a * v + (1 - a) * lvl
        return lvl

    zl, pl = ses(zs), ses(ps)
    sz = sum(z for _, z in dem)
    szz = sum(z * z for _, z in dem)
    adi = dem[-1][0] / m
    cv2 = (m * szz - sz * sz) * m / ((m - 1) * sz * sz)
    assert r["n_days"] == n_days
    assert r["n_demands"] == m
    assert abs(r["zero_share"] - (1 - m / n_days)) < 1e-6
    assert abs(r["adi"] - adi) < 1e-6
    assert abs(r["cv2"] - cv2) < 1e-6
    assert abs(r["size_level"] - zl) < 1e-6
    assert abs(r["interval_level"] - pl) < 1e-6
    assert abs(r["croston"] - zl / pl) < 1e-6
    assert abs(r["sba"] - 0.9 * zl / pl) < 1e-6
    cls = (
        "smooth" if adi < 1.32 and cv2 < 0.49
        else "intermittent" if adi >= 1.32 and cv2 < 0.49
        else "erratic" if adi < 1.32
        else "lumpy"
    )
    assert r["demand_class"] == cls
    assert r["interval_level"] >= 1.0


def test_tracking_signal_rebuild(spark):
    """Brown tracking signal vs a literal python SES(0.3) rebuild
    over the daily volumes, plus the TS bound |TS| <= n-1 and the
    bias-direction banding."""
    from mpds_spark.queries import q_tracking_signal

    r = q_tracking_signal(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb

    ys = [
        float(t[0])
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    lvl = ys[0]
    cum = sad = 0.0
    for t in range(1, n):
        e = ys[t] - lvl
        cum += e
        sad += abs(e)
        lvl = 0.3 * ys[t] + 0.7 * lvl
    mad = sad / (n - 1)
    ts = cum / mad
    assert r["n_days"] == n
    assert r["alpha"] == 0.3
    assert abs(r["cum_error"] - cum) < 1e-6
    assert abs(r["mad"] - mad) < 1e-6
    assert abs(r["tracking_signal"] - ts) < 1e-6
    assert r["alarm"] == (abs(ts) > 4.0)
    assert abs(r["tracking_signal"]) <= n - 1
    if ts > 0:
        assert r["bias_direction"] == "under_forecasting"
    elif ts < 0:
        assert r["bias_direction"] == "over_forecasting"


def test_g_test_rebuild(spark):
    """G and Williams q vs a literal python rebuild over the
    daypart x type table, plus the G ~ X^2 proximity (both should
    call the same verdict on a clean table) and q > 1."""
    import math
    from collections import defaultdict

    from mpds_spark.queries import q_g_test

    r = q_g_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST((epoch_us(ts) // 21600000000) % 4 AS BIGINT),"
        " event_type, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    o = defaultdict(int)
    for rr, c, n in rows:
        o[(rr, c)] = n
    N = sum(o.values())
    rws = sorted({k[0] for k in o})
    cls = sorted({k[1] for k in o})
    R = {x: sum(v for k, v in o.items() if k[0] == x) for x in rws}
    C = {x: sum(v for k, v in o.items() if k[1] == x) for x in cls}
    g = 2 * sum(
        v * math.log(v * N / (R[k[0]] * C[k[1]]))
        for k, v in o.items()
        if v > 0
    )
    q = 1 + (
        (N * sum(1 / R[x] for x in rws) - 1)
        * (N * sum(1 / C[x] for x in cls) - 1)
    ) / (6 * N * (len(rws) - 1) * (len(cls) - 1))
    assert r["n_events"] == N
    assert r["n_cells"] == len(o)
    assert r["dof"] == (len(rws) - 1) * (len(cls) - 1)
    assert abs(r["g_stat"] - g) < 1e-5
    assert abs(r["q_williams"] - q) < 1e-6
    assert abs(r["g_adjusted"] - g / q) < 1e-5
    assert r["q_williams"] > 1.0
    assert r["reject_5pct"] == (g / q > 21.026)


def test_mood_median_rebuild(spark):
    """Mood's median chi2 vs a literal python rebuild (exact lower
    median of the cents, 2xk above/<=median table), plus the
    marginal identity sum(ab) = n_above."""
    from collections import defaultdict

    from mpds_spark.queries import q_mood_median_test

    r = q_mood_median_test(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT event_type,"
        " CAST(floor(value * 100 + 0.5) AS BIGINT)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    cents = sorted(c for _, c in rows)
    N = len(cents)
    med = cents[(N + 1) // 2 - 1]  # lower median order statistic
    g = defaultdict(lambda: [0, 0])
    for t, c in rows:
        if c > med:
            g[t][0] += 1
        else:
            g[t][1] += 1
    A = sum(v[0] for v in g.values())
    chi2 = 0.0
    for t in sorted(g):
        ab, be = g[t]
        n_i = ab + be
        ea = n_i * A / N
        eb = n_i * (N - A) / N
        chi2 += (ab - ea) ** 2 / ea + (be - eb) ** 2 / eb
    assert r["k_groups"] == len(g)
    assert r["n_events"] == N
    assert abs(r["grand_median"] - med / 100.0) < 1e-9
    assert r["n_above"] == A
    assert abs(r["chi2"] - chi2) < 1e-5
    assert r["dof"] == len(g) - 1
    assert r["reject_5pct"] == (chi2 > 9.488)
    assert r["n_above"] * 2 <= N  # lower-median dichotomy property


def test_nelson_aalen_rebuild(spark):
    """NA cumulative hazard/variance vs a literal python rebuild of
    the hour-binned lifetime table (7-day censoring), plus
    exp(-H) >= KM at every bin (the classic FH >= KM dominance) and
    monotonicity."""
    from mpds_spark.queries import q_nelson_aalen, q_survival_km

    rows = q_nelson_aalen(spark, "/root/testdata/sf0.001").collect()
    km = {
        r["duration_bin"]: r["km_survival"]
        for r in q_survival_km(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    spans = duckdb.sql(
        "SELECT min(epoch_us(ts)), max(epoch_us(ts)) FROM"
        " '/root/testdata/sf0.001/events.parquet' GROUP BY user_id"
    ).fetchall()
    mx = max(t for _, t in spans)
    life = [
        ((t - s) // 3600000000, 1 if t <= mx - 604800000000 else 0)
        for s, t in spans
    ]
    from collections import defaultdict

    curve = defaultdict(lambda: [0, 0])
    for b, obs in life:
        curve[b][0] += obs
        curve[b][1] += 1 - obs
    n0 = len(life)
    h = v = 0.0
    seen = 0
    exp_rows = []
    for b in sorted(curve):
        d, c = curve[b]
        r_ = n0 - seen
        if d > 0:
            h += d / r_
            v += d / (r_ * r_)
        exp_rows.append((b, r_, d, h, v))
        seen += d + c
    assert len(rows) == len(exp_rows)
    prev_h = -1.0
    for got, (b, r_, d, hh, vv) in zip(rows, exp_rows):
        assert got["duration_bin"] == b
        assert got["n_risk"] == r_
        assert got["n_events"] == d
        assert abs(got["na_cumhaz"] - hh) < 1e-6
        assert abs(got["na_var"] - vv) < 1e-6
        assert got["na_cumhaz"] >= prev_h
        prev_h = got["na_cumhaz"]
        if b in km:
            # Fleming-Harrington dominates KM
            assert got["fh_survival"] >= km[b] - 1e-9


def test_theta_forecast_rebuild(spark):
    """Theta forecasts vs a literal python rebuild (OLS theta-0
    line, SES(0.3) on the theta-2 line, 50/50 combination), plus the
    equal-spacing identity forecast_2 - forecast_1 = b/2."""
    from mpds_spark.queries import q_theta_forecast

    r = q_theta_forecast(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb

    ys = [
        float(t[0])
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    ts = list(range(1, n + 1))
    tb = sum(ts) / n
    yb = sum(ys) / n
    b = sum((t - tb) * (y - yb) for t, y in zip(ts, ys)) / sum(
        (t - tb) ** 2 for t in ts
    )
    a = yb - b * tb
    th2 = [2 * y - (a + b * t) for t, y in zip(ts, ys)]
    lvl = th2[0]
    for x in th2[1:]:
        lvl = 0.3 * x + 0.7 * lvl
    assert r["n_days"] == n
    assert abs(r["trend_slope"] - b) < 1e-6
    assert abs(r["trend_intercept"] - a) < 1e-6
    assert abs(r["theta2_level"] - lvl) < 1e-6
    for h in (1, 2, 3):
        exp = 0.5 * (a + b * (n + h)) + 0.5 * lvl
        assert abs(r[f"forecast_{h}"] - exp) < 1e-6
    assert abs(
        (r["forecast_2"] - r["forecast_1"]) - b / 2
    ) < 1e-5
    assert r["naive_last"] == ys[-1]


def test_allan_variance_rebuild(spark):
    """AVAR(1,2,4) vs a literal python rebuild of the non-
    overlapping block differences, plus the white-noise direction
    check that AVAR is finite and positive at every tau."""
    from mpds_spark.queries import q_allan_variance

    rows = q_allan_variance(
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    got = {r["tau_days"]: r for r in rows}
    for tau in (1, 2, 4):
        m = n // tau
        if m <= 1:
            assert tau not in got
            continue
        S = [
            sum(ys[(k - 1) * tau:(k - 1) * tau + tau])
            for k in range(1, m + 1)
        ]
        num = sum(
            (S[k] - S[k - 1]) ** 2 for k in range(1, m)
        )
        avar = num / (2 * (m - 1) * tau * tau)
        r = got[tau]
        assert r["n_days"] == n
        assert r["m_blocks"] == m
        assert r["diff2_sum"] == num
        assert abs(r["avar"] - avar) < 1e-6
        assert abs(r["adev"] - avar ** 0.5) < 1e-6
        assert r["avar"] > 0


def test_rqa_rebuild(spark):
    """RR/DET/LMAX vs a literal python recurrence-matrix rebuild at
    r = 0.5*SD, plus DET membership logic and the LMAX >= 2 iff
    any-diagonal-pair consistency."""
    from mpds_spark.queries import q_recurrence_quantification

    r = q_recurrence_quantification(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    m = sum(ys) / n
    sd = (sum((y - m) ** 2 for y in ys) / (n - 1)) ** 0.5
    tol = 0.5 * sd

    def rec(i, j):
        return abs(ys[i] - ys[j]) <= tol

    nrec = ndet = 0
    for i in range(n - 1):
        for j in range(i + 1, n):
            if rec(i, j):
                nrec += 1
                nxt = i + 1 < n and j + 1 < n and rec(i + 1, j + 1)
                prv = i > 0 and rec(i - 1, j - 1)
                if nxt or prv:
                    ndet += 1
    lmax = 0
    for d in range(1, n):
        run = 0
        for k in range(0, n - d):
            if rec(k, k + d):
                run += 1
                lmax = max(lmax, run)
            else:
                run = 0
    assert r["n_days"] == n
    assert abs(r["r_tol"] - tol) < 1e-6
    assert r["n_recurrent"] == nrec
    assert abs(
        r["recurrence_rate"] - nrec / (n * (n - 1) / 2)
    ) < 1e-6
    assert abs(r["determinism"] - ndet / nrec) < 1e-6
    assert r["lmax"] == lmax
    assert (r["lmax"] >= 2) == (r["determinism"] > 0)
    assert 0.0 <= r["determinism"] <= 1.0


def test_rare_word_profile_rebuild(spark):
    """Honore R / Sichel S / Brunet W vs a literal python rebuild of
    the per-source frequency spectrum, plus the V1+V2 <= V sanity
    and the R-collapses-without-hapaxes reading."""
    import math
    from collections import Counter, defaultdict

    from mpds_spark.queries import q_rare_word_profile

    rows = q_rare_word_profile(
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    docs = duckdb.sql(
        "SELECT source, text FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    bysrc = defaultdict(Counter)
    for s, t in docs:
        bysrc[s].update(t.strip().split())
    got = {r["source"]: r for r in rows}
    for s, cnt in bysrc.items():
        n = sum(cnt.values())
        v = len(cnt)
        v1 = sum(1 for c in cnt.values() if c == 1)
        v2 = sum(1 for c in cnt.values() if c == 2)
        if not (n > 1 and v > 1 and v1 < v):
            assert s not in got
            continue
        r = got[s]
        assert r["n_tokens"] == n
        assert r["vocab"] == v
        assert r["v1"] == v1
        assert r["v2"] == v2
        assert v1 + v2 <= v
        hon = 100 * math.log(n) / (1 - v1 / v)
        assert abs(r["honore_r"] - hon) < 1e-4
        assert abs(r["sichel_s"] - v2 / v) < 1e-6
        w = math.exp(math.log(n) * math.exp(-0.165 * math.log(v)))
        assert abs(r["brunet_w"] - w) < 1e-4


def test_burrows_delta_rebuild(spark):
    """Nearest/farthest sources by Burrows Delta vs a literal
    python rebuild over the global top-20 word z-profiles, plus the
    symmetry sanity that delta_min <= delta_max everywhere."""
    from collections import Counter, defaultdict

    from mpds_spark.queries import q_burrows_delta

    rows = q_burrows_delta(spark, "/root/testdata/sf0.001").collect()
    import duckdb

    docs = duckdb.sql(
        "SELECT source, text FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    bysrc = defaultdict(Counter)
    total = Counter()
    for s, t in docs:
        ws = t.strip().split()
        bysrc[s].update(ws)
        total.update(ws)
    top = [
        w for w, _ in sorted(
            total.items(), key=lambda kv: (-kv[1], kv[0])
        )[:20]
    ]
    srcs = sorted(bysrc)
    ns = len(srcs)
    f = {
        s: [bysrc[s][w] / sum(bysrc[s].values()) for w in sorted(top)]
        for s in srcs
    }
    nw = len(top)
    mus = [sum(f[s][i] for s in srcs) / ns for i in range(nw)]
    sds = [
        (sum((f[s][i] - mus[i]) ** 2 for s in srcs) / (ns - 1))
        ** 0.5
        for i in range(nw)
    ]
    z = {
        s: [(f[s][i] - mus[i]) / sds[i] for i in range(nw)]
        for s in srcs
    }

    def delta(a, b):
        return sum(
            abs(z[a][i] - z[b][i]) for i in range(nw)
        ) / nw

    got = {r["source"]: r for r in rows}
    assert set(got) == set(srcs)
    for s in srcs:
        ds = sorted(
            ((delta(s, o), o) for o in srcs if o != s)
        )
        r = got[s]
        assert r["nearest_source"] == ds[0][1]
        assert abs(r["delta_min"] - ds[0][0]) < 1e-6
        assert r["farthest_source"] == ds[-1][1]
        assert abs(r["delta_max"] - ds[-1][0]) < 1e-6
        assert r["delta_min"] <= r["delta_max"]


def test_turning_difference_sign_rebuild(spark):
    """Both Kendall-Stuart randomness screens vs literal python
    rebuilds on the daily volumes, plus the structural bounds
    T <= n-2 and S <= n-1 and verdict-sign consistency."""
    from mpds_spark.queries import (
        q_difference_sign,
        q_turning_points,
    )

    rt = q_turning_points(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rs = q_difference_sign(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    tp = sum(
        1
        for t in range(1, n - 1)
        if (ys[t] - ys[t - 1]) * (ys[t] - ys[t + 1]) > 0
    )
    s = sum(1 for t in range(1, n) if ys[t] > ys[t - 1])
    et = 2 * (n - 2) / 3
    vt = (16 * n - 29) / 90
    es = (n - 1) / 2
    vs = (n + 1) / 12
    assert rt["n_days"] == n and rs["n_days"] == n
    assert rt["n_turning"] == tp
    assert rs["n_up_steps"] == s
    assert rt["n_turning"] <= n - 2
    assert rs["n_up_steps"] <= n - 1
    assert abs(rt["expected"] - et) < 1e-6
    assert abs(rt["variance"] - vt) < 1e-6
    assert abs(rt["z_stat"] - (tp - et) / vt ** 0.5) < 1e-6
    assert abs(rs["expected"] - es) < 1e-6
    assert abs(rs["variance"] - vs) < 1e-6
    assert abs(rs["z_stat"] - (s - es) / vs ** 0.5) < 1e-6
    assert rt["reject_5pct"] == (abs(rt["z_stat"]) > 1.96)
    assert rs["reject_5pct"] == (abs(rs["z_stat"]) > 1.96)
    if tp < et:
        assert rt["verdict"] == "too_smooth"
    if s > es:
        assert rs["verdict"] == "upward_trend"
    elif s < es:
        assert rs["verdict"] == "downward_trend"


def test_cox_stuart_bartels_rebuild(spark):
    """Cox-Stuart sign counts and Bartels RVN vs literal python
    rebuilds (midrank construction included), plus RVN in (0, 4)
    and the Cox-Stuart pair bound m <= n div 2."""
    from mpds_spark.queries import q_bartels_rank, q_cox_stuart

    rc = q_cox_stuart(spark, "/root/testdata/sf0.001").collect()[0]
    rb = q_bartels_rank(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    c = n // 2
    sp = sum(1 for i in range(c) if ys[i + c] > ys[i])
    m = sum(1 for i in range(c) if ys[i + c] != ys[i])
    z = (2 * sp - m) / m ** 0.5
    assert rc["n_days"] == n
    assert rc["offset"] == c
    assert rc["n_pairs"] == m
    assert m <= c
    assert rc["n_later_wins"] == sp
    assert abs(rc["z_stat"] - z) < 1e-6
    assert rc["reject_5pct"] == (abs(z) > 1.96)
    # midranks
    r = [
        sum(1 for v in ys if v < y)
        + (sum(1 for v in ys if v == y) + 1) / 2
        for y in ys
    ]
    rbar = (n + 1) / 2
    num = sum(
        (r[t] - r[t + 1]) ** 2 for t in range(n - 1)
    )
    den = sum((x - rbar) ** 2 for x in r)
    rvn = num / den
    var = (
        4 * (n - 2) * (5 * n * n - 2 * n - 9)
        / (5 * n * (n + 1) * (n - 1) ** 2)
    )
    assert rb["n_days"] == n
    assert abs(rb["rvn"] - rvn) < 1e-6
    assert abs(rb["variance"] - var) < 1e-6
    assert abs(rb["z_stat"] - (rvn - 2) / var ** 0.5) < 1e-6
    assert 0.0 < rb["rvn"] < 4.0
    assert rb["reject_5pct"] == (
        abs((rvn - 2) / var ** 0.5) > 1.96
    )


def test_buishand_snht_rebuild(spark):
    """Buishand R/U and SNHT T0 vs literal python rebuilds of the
    classical definitions (cumulative deviations from the mean,
    n-denominator std), plus the argmax changepoint days and the
    structural bounds 0 <= U and T_k >= 0."""
    from mpds_spark.queries import q_buishand_range, q_snht_test

    rb = q_buishand_range(spark, "/root/testdata/sf0.001").collect()[0]
    rs = q_snht_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts) AS d, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY d ORDER BY d"
    ).fetchall()
    days = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    n = len(ys)
    ybar = sum(ys) / n
    sk = []
    acc = 0.0
    for y in ys[:-1]:
        acc += y - ybar
        sk.append(acc)
    dx = (sum((y - ybar) ** 2 for y in ys) / n) ** 0.5
    r_stat = (max(max(sk), 0.0) - min(min(sk), 0.0)) / (
        dx * n ** 0.5
    )
    u_stat = sum(s * s for s in sk) / (dx * dx * n * (n + 1))
    assert rb["n_days"] == n
    assert abs(rb["r_stat"] - r_stat) < 1e-6
    assert abs(rb["u_stat"] - u_stat) < 1e-6
    assert u_stat >= 0.0
    cp = max(range(len(sk)), key=lambda k: (abs(sk[k]), -k))
    assert rb["cp_day"] == days[cp]
    assert rb["reject_5pct"] == (r_stat > 1.55)
    # SNHT
    tks = []
    for k in range(1, n):
        z1 = (sum(ys[:k]) / k - ybar) / dx
        z2 = (sum(ys[k:]) / (n - k) - ybar) / dx
        tks.append(k * z1 * z1 + (n - k) * z2 * z2)
    t0 = max(tks)
    assert all(t >= 0.0 for t in tks)
    assert rs["n_days"] == n
    assert abs(rs["t0_stat"] - t0) < 1e-6
    cpk = max(range(len(tks)), key=lambda k: (tks[k], -k))
    assert rs["cp_day"] == days[cpk]
    assert rs["reject_5pct"] == (t0 > 7.65)


def test_jonckheere_hodges_rebuild(spark):
    """Jonckheere-Terpstra J / tie-corrected variance and the
    Hodges-Lehmann estimators vs literal python rebuilds (group-
    keyed tie sums rebuilt the classical way, Walsh averages and
    cross-half differences enumerated)."""
    from mpds_spark.queries import (
        q_hodges_lehmann,
        q_jonckheere_terpstra,
    )

    rj = q_jonckheere_terpstra(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rh = q_hodges_lehmann(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb
    from collections import Counter

    rows = duckdb.sql(
        "SELECT day(ts) AS d, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY d ORDER BY d"
    ).fetchall()
    days = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    ws = [(d - 1) // 7 for d in days]
    n = len(ys)
    j = 0.0
    for i in range(n):
        for k in range(i + 1, n):
            if ws[i] < ws[k]:
                if ys[i] < ys[k]:
                    j += 1.0
                elif ys[i] == ys[k]:
                    j += 0.5
    ni = Counter(ws)
    tj = Counter(ys)
    sg = sum(v * v for v in ni.values())
    e = (n * n - sg) / 4.0
    a1 = sum(v * (v - 1) * (2 * v + 5) for v in ni.values())
    b1 = sum(v * (v - 1) * (2 * v + 5) for v in tj.values())
    a2 = sum(v * (v - 1) * (v - 2) for v in ni.values())
    b2 = sum(v * (v - 1) * (v - 2) for v in tj.values())
    a3 = sum(v * (v - 1) for v in ni.values())
    b3 = sum(v * (v - 1) for v in tj.values())
    var = (
        (n * (n - 1) * (2 * n + 5) - a1 - b1) / 72.0
        + a2 * b2 / (36.0 * n * (n - 1) * (n - 2))
        + a3 * b3 / (8.0 * n * (n - 1))
    )
    z = (j - e) / var ** 0.5
    assert rj["n_days"] == n
    assert rj["n_groups"] == len(ni)
    assert abs(rj["j_stat"] - j) < 1e-6
    assert abs(rj["e_j"] - e) < 1e-6
    assert abs(rj["var_j"] - var) < 1e-6
    assert abs(rj["z_stat"] - z) < 1e-6
    assert rj["reject_5pct"] == (abs(z) > 1.96)
    # Hodges-Lehmann
    import statistics

    walsh = [
        (ys[i] + ys[k]) / 2.0
        for i in range(n)
        for k in range(i, n)
    ]
    h = n // 2
    diffs = [
        ys[k] - ys[i] for i in range(h) for k in range(h, n)
    ]
    assert rh["n_days"] == n
    assert rh["n_first_half"] == h
    assert rh["n_second_half"] == n - h
    assert abs(rh["pseudo_median"] - statistics.median(walsh)) < 1e-6
    assert abs(rh["hl_shift"] - statistics.median(diffs)) < 1e-6


def test_dm_pt_rebuild(spark):
    """Diebold-Mariano (naive vs alpha=1/2 SES, HLN-corrected) and
    Pesaran-Timmermann vs literal python rebuilds with a plain SES
    recursion (no closed form) and explicit direction counts."""
    from mpds_spark.queries import (
        q_diebold_mariano,
        q_pesaran_timmermann,
    )

    rd = q_diebold_mariano(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rp = q_pesaran_timmermann(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    s = float(ys[0])
    ds = []
    for t in range(1, n):
        e1 = ys[t] - ys[t - 1]
        e2 = ys[t] - s
        ds.append(float(e1 * e1) - e2 * e2)
        s = (ys[t] + s) / 2.0
    m = n - 1
    dbar = sum(ds) / m
    g0 = sum((d - dbar) ** 2 for d in ds) / m
    dm = dbar / (g0 / m) ** 0.5
    hln = dm * ((m - 1) / m) ** 0.5
    assert rd["n_days"] == n
    assert rd["n_forecasts"] == m
    assert abs(rd["mean_loss_diff"] - dbar) < max(1e-6, abs(dbar) * 1e-9)
    assert abs(rd["dm_stat"] - dm) < 1e-6
    assert abs(rd["hln_stat"] - hln) < 1e-6
    assert rd["reject_5pct"] == (abs(hln) > 1.96)
    # PT
    mm = n - 2
    acts = [1 if ys[t] > ys[t - 1] else 0 for t in range(2, n)]
    preds = [1 if ys[t - 1] > ys[t - 2] else 0 for t in range(2, n)]
    ph = sum(1 for a, p in zip(acts, preds) if a == p) / mm
    py = sum(acts) / mm
    px = sum(preds) / mm
    ps = py * px + (1 - py) * (1 - px)
    vh = ps * (1 - ps) / mm
    vs = (
        (2 * py - 1) ** 2 * px * (1 - px) / mm
        + (2 * px - 1) ** 2 * py * (1 - py) / mm
        + 4 * py * px * (1 - py) * (1 - px) / mm ** 2
    )
    pt = (ph - ps) / (vh - vs) ** 0.5
    assert rp["n_days"] == n
    assert rp["n_predictions"] == mm
    assert abs(rp["hit_rate"] - ph) < 1e-6
    assert abs(rp["p_star"] - ps) < 1e-6
    assert abs(rp["pt_stat"] - pt) < 1e-6
    assert rp["reject_5pct"] == (pt > 1.645)


def test_fleiss_icc_rebuild(spark):
    """Fleiss' kappa and ICC(2,1)/ICC(3,1) vs literal python
    rebuilds from the raw event stream (per-item category counts
    and the classical two-way ANOVA on float values)."""
    from mpds_spark.queries import q_fleiss_kappa, q_icc_agreement

    rf = q_fleiss_kappa(spark, "/root/testdata/sf0.001").collect()[0]
    ri = q_icc_agreement(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb
    from collections import Counter, defaultdict

    rows = duckdb.sql(
        "SELECT user_id, event_type, value FROM (SELECT *,"
        " row_number() OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS rn FROM"
        " '/root/testdata/sf0.001/events.parquet') WHERE rn <= 6"
        " ORDER BY user_id, rn"
    ).fetchall()
    per_user = defaultdict(list)
    for u, t, v in rows:
        per_user[u].append((t, v))
    items = {u: r for u, r in per_user.items() if len(r) == 6}
    n, R = len(items), 6
    pis = []
    marg = Counter()
    for r in items.values():
        c = Counter(t for t, _ in r)
        marg.update(c)
        pis.append(
            (sum(v * v for v in c.values()) - R) / (R * (R - 1))
        )
    pbar = sum(pis) / n
    pe = sum((v / (n * R)) ** 2 for v in marg.values())
    kappa = (pbar - pe) / (1 - pe)
    assert rf["n_items"] == n
    assert abs(rf["p_bar"] - pbar) < 1e-6
    assert abs(rf["p_e"] - pe) < 1e-6
    assert abs(rf["kappa"] - kappa) < 1e-6
    assert -1.0 <= rf["kappa"] <= 1.0
    # ICC on the first-4 value matrix (cents-rounded like the query)
    k = 4
    mat = [
        [round(v * 100) / 100.0 for _, v in r[:k]]
        for r in per_user.values()
        if len(r) >= k
    ]
    nu = len(mat)
    t = sum(sum(r) for r in mat)
    corr = t * t / (nu * k)
    ssr = sum(sum(r) ** 2 for r in mat) / k - corr
    ssc = (
        sum(sum(mat[i][j] for i in range(nu)) ** 2 for j in range(k))
        / nu
        - corr
    )
    sst = sum(v * v for r in mat for v in r) - corr
    sse = sst - ssr - ssc
    msr, msc, mse = (
        ssr / (nu - 1),
        ssc / (k - 1),
        sse / ((nu - 1) * (k - 1)),
    )
    icc21 = (msr - mse) / (
        msr + (k - 1) * mse + k * (msc - mse) / nu
    )
    icc31 = (msr - mse) / (msr + (k - 1) * mse)
    assert ri["n_users"] == nu
    assert abs(ri["ms_rows"] - msr) < max(1e-5, abs(msr) * 1e-7)
    assert abs(ri["ms_cols"] - msc) < max(1e-5, abs(msc) * 1e-7)
    assert abs(ri["ms_error"] - mse) < max(1e-5, abs(mse) * 1e-7)
    assert abs(ri["icc_2_1"] - icc21) < 1e-5
    assert abs(ri["icc_3_1"] - icc31) < 1e-5


def test_atkinson_gpd_rebuild(spark):
    """Atkinson/Hoover and the GPD L-moment tail fit vs literal
    python rebuilds on raw per-user counts / sorted excesses (no
    histogram collapse — an independent construction), plus the
    A(0.5) <= A(1) convexity ordering and Hoover in [0, 1)."""
    from mpds_spark.queries import q_atkinson_hoover, q_gpd_tail_fit

    ra = q_atkinson_hoover(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rg = q_gpd_tail_fit(spark, "/root/testdata/sf0.001").collect()[0]
    import math

    import duckdb

    xs = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY user_id"
        ).fetchall()
    ]
    n, s = len(xs), sum(xs)
    mu = s / n
    hoover = sum(abs(x - mu) for x in xs) / (2 * s)
    a1 = 1 - math.exp(sum(math.log(x) for x in xs) / n) / mu
    a05 = 1 - (sum(math.sqrt(x) for x in xs) / n) ** 2 / mu
    assert ra["n_users"] == n
    assert ra["total_events"] == s
    assert abs(ra["hoover_index"] - hoover) < 1e-6
    assert abs(ra["atkinson_05"] - a05) < 1e-6
    assert abs(ra["atkinson_1"] - a1) < 1e-6
    assert 0.0 <= ra["hoover_index"] < 1.0
    assert ra["atkinson_05"] <= ra["atkinson_1"] + 1e-12
    # GPD tail fit on sorted purchase cents
    cs = sorted(
        t[0]
        for t in duckdb.sql(
            "SELECT CAST(sign(value) * floor(abs(value) * 100 + 0.5)"
            " AS BIGINT) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " WHERE event_type = 'purchase'"
        ).fetchall()
    )
    np_ = len(cs)
    r = -(-9 * np_ // 10)  # ceil(0.9 N)
    thr = cs[r - 1]
    exc = sorted(c - thr for c in cs if c > thr)
    m = len(exc)
    l1 = sum(exc) / m
    b1 = sum(i * x for i, x in enumerate(exc)) / (m * (m - 1))
    l2 = 2 * b1 - l1
    k = l1 / l2 - 2
    assert rg["n_purchases"] == np_
    assert abs(rg["threshold_dollars"] - thr / 100.0) < 1e-9
    assert rg["n_exceed"] == m
    assert abs(rg["mean_excess_dollars"] - l1 / 100.0) < 1e-6
    assert abs(rg["xi_hat"] - (-k)) < 1e-6
    assert abs(rg["sigma_dollars"] - l1 * (1 + k) / 100.0) < 1e-5


def test_getis_conover_rebuild(spark):
    """Getis-Ord global G (PySAL-style B0..B4 randomization
    variance rebuilt literally) and Conover squared-ranks vs python
    rebuilds using plain float deviations and scipy-free midranks."""
    from mpds_spark.queries import q_conover_scale, q_getis_ord_g

    rg = q_getis_ord_g(spark, "/root/testdata/sf0.001").collect()[0]
    rc = q_conover_scale(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY hour(ts) ORDER BY hour(ts)"
        ).fetchall()
    ]
    n = len(ys)
    num = 2 * sum(
        ys[i] * ys[(i + 1) % n] for i in range(n)
    )
    m1 = sum(ys)
    m2 = sum(v * v for v in ys)
    m3 = sum(v ** 3 for v in ys)
    m4 = sum(v ** 4 for v in ys)
    den = m1 * m1 - m2
    g = num / den
    e = 2.0 / (n - 1)
    w, s1, s2 = 2 * n, 4 * n, 16 * n
    b0 = (n * n - 3 * n + 3) * s1 - n * s2 + 3 * w * w
    b1 = -((n * n - n) * s1 - 2 * n * s2 + 6 * w * w)
    b2 = -(2 * n * s1 - (n + 3) * s2 + 6 * w * w)
    b3 = 4 * (n - 1) * s1 - 2 * (n + 1) * s2 + 8 * w * w
    b4 = s1 - s2 + w * w
    eg2 = (
        b0 * m2 * m2 + b1 * m4 + b2 * m1 * m1 * m2
        + b3 * m1 * m3 + b4 * m1 ** 4
    ) / (den * den * n * (n - 1) * (n - 2) * (n - 3))
    var = eg2 - e * e
    z = (g - e) / var ** 0.5
    assert rg["n_cells"] == n
    assert abs(rg["g_stat"] - g) < 1e-6
    assert abs(rg["e_g"] - e) < 1e-6
    assert abs(rg["var_g"] - var) < 1e-6
    assert abs(rg["z_stat"] - z) < 1e-5
    assert rg["reject_5pct"] == (abs(z) > 1.96)
    # Conover squared ranks, plain float rebuild
    rows = duckdb.sql(
        "SELECT CASE WHEN isodow(date_trunc('day', ts)) >= 6"
        " THEN 1 ELSE 0 END AS we, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY date_trunc('day', ts)"
    ).fetchall()
    g1v = [y for w_, y in rows if w_ == 1]
    g2v = [y for w_, y in rows if w_ == 0]
    mu1, mu2 = sum(g1v) / len(g1v), sum(g2v) / len(g2v)
    us = [(abs(y - mu1), 1) for y in g1v] + [
        (abs(y - mu2), 0) for y in g2v
    ]
    nn = len(us)
    # midranks the simple way
    vals = sorted(u for u, _ in us)
    def midrank(u):
        lt = sum(1 for v in vals if v < u)
        eq = sum(1 for v in vals if v == u)
        return lt + (eq + 1) / 2.0
    t = sum(midrank(u) ** 2 for u, w_ in us if w_ == 1)
    q2 = sum(midrank(u) ** 2 for u, _ in us)
    q4 = sum(midrank(u) ** 4 for u, _ in us)
    n1, n2 = len(g1v), len(g2v)
    et = n1 * q2 / nn
    vt = n1 * n2 / (nn * (nn - 1)) * (q4 - q2 * q2 / nn)
    z = (t - et) / vt ** 0.5
    assert rc["n_days"] == nn
    assert rc["n_weekend"] == n1
    assert rc["n_weekday"] == n2
    assert abs(rc["t_stat"] - t) < 1e-6
    assert abs(rc["e_t"] - et) < 1e-6
    assert abs(rc["var_t"] - vt) < 1e-6
    assert abs(rc["z_stat"] - z) < 1e-6
    assert rc["reject_5pct"] == (abs(z) > 1.96)


def test_rmst_quade_rebuild(spark):
    """RMST vs a literal trapezoid-free step-function integral over
    an independently rebuilt KM curve, and the Quade statistic vs
    the classical construction with float midranks and unscaled
    S_ij = Q_i (r_ij - 4)."""
    from mpds_spark.queries import q_quade_test, q_rmst

    rr = q_rmst(spark, "/root/testdata/sf0.001").collect()[0]
    rq = q_quade_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    spans = duckdb.sql(
        "SELECT CAST((max(epoch_us(ts)) - min(epoch_us(ts)))"
        " // 3600000000 AS BIGINT) AS b,"
        " CASE WHEN max(epoch_us(ts)) <= (SELECT max(epoch_us(ts))"
        " FROM '/root/testdata/sf0.001/events.parquet')"
        " - 604800000000 THEN 1 ELSE 0 END AS obs"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY user_id"
    ).fetchall()
    from collections import defaultdict

    ev = defaultdict(lambda: [0, 0])
    for b, o in spans:
        ev[b][0] += o
        ev[b][1] += 1 - o
    bins = sorted(ev)
    at_risk = len(spans)
    surv, s = [], 1.0
    for b in bins:
        d, c = ev[b]
        if d == at_risk:
            s = 0.0
        else:
            s *= (at_risk - d) / at_risk
        surv.append((b, s))
        at_risk -= d + c

    def rmst(tau):
        total = min(surv[0][0], tau)
        for k, (b, sk) in enumerate(surv):
            nxt = surv[k + 1][0] if k + 1 < len(surv) else tau
            total += sk * (min(nxt, tau) - min(b, tau))
        return total / 24.0

    assert rr["n_bins"] == len(bins)
    assert abs(rr["rmst_7d_days"] - rmst(168)) < 1e-5
    assert abs(rr["rmst_14d_days"] - rmst(336)) < 1e-5
    assert rr["rmst_7d_days"] <= rr["rmst_14d_days"] + 1e-9
    assert 0.0 <= rr["restricted_frac_7d"] <= 1.0
    # Quade classical rebuild
    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " WHERE day(ts) <= 28 GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    assert len(ys) == 28
    blocks = [ys[7 * b : 7 * b + 7] for b in range(4)]

    def midranks(vals):
        return [
            sum(1 for v in vals if v < x)
            + (sum(1 for v in vals if v == x) + 1) / 2.0
            for x in vals
        ]

    rij = [midranks(b) for b in blocks]
    rngs = [max(b) - min(b) for b in blocks]
    q = midranks(rngs)
    sij = [
        [q[i] * (rij[i][j] - 4.0) for j in range(7)]
        for i in range(4)
    ]
    a = sum(v * v for row in sij for v in row)
    sj = [sum(sij[i][j] for i in range(4)) for j in range(7)]
    b_ = sum(v * v for v in sj) / 4.0
    f = 3.0 * b_ / (a - b_)
    assert abs(rq["f_stat"] - f) < 1e-6
    assert rq["reject_5pct"] == (f > 2.661)


def test_honore_spiegelhalter_rebuild(spark):
    """Honore R / Sichel S vs a Counter-based python rebuild of the
    per-source frequency spectrum, and Spiegelhalter's Z vs the
    textbook float formula sum (y-p)(1-2p)/sqrt(sum (1-2p)^2
    p(1-p)) on raw probabilities."""
    from mpds_spark.queries import (
        q_honore_sichel,
        q_spiegelhalter_z,
    )

    rh = {
        r["source"]: r
        for r in q_honore_sichel(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    rs = q_spiegelhalter_z(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import math
    from collections import Counter

    import duckdb

    rows = duckdb.sql(
        "SELECT source, text FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    per_source = {}
    for src_, text in rows:
        per_source.setdefault(src_, Counter()).update(
            text.strip().split()
        )
    for src_, c in per_source.items():
        n = sum(c.values())
        v = len(c)
        v1 = sum(1 for x in c.values() if x == 1)
        v2 = sum(1 for x in c.values() if x == 2)
        if v1 >= v:
            assert src_ not in rh
            continue
        r = rh[src_]
        assert r["n_tokens"] == n
        assert r["vocab"] == v
        assert r["v1_hapax"] == v1
        assert r["v2_dis"] == v2
        assert abs(
            r["honore_r"] - 100 * math.log(n) / (1 - v1 / v)
        ) < 1e-5
        assert abs(r["sichel_s"] - v2 / v) < 1e-6
    # Spiegelhalter float rebuild
    rows = duckdb.sql(
        "SELECT least(n_chars, 400),"
        " CASE WHEN len(regexp_split_to_array(trim(text),"
        " '\\s+')) >= 50 THEN 1 ELSE 0 END FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    num = sum((y - m / 400) * (1 - 2 * m / 400) for m, y in rows)
    den = sum(
        (1 - 2 * m / 400) ** 2 * (m / 400) * (1 - m / 400)
        for m, _ in rows
    )
    z = num / den ** 0.5
    assert rs["n_docs"] == len(rows)
    assert abs(rs["z_stat"] - z) < 1e-5
    assert rs["reject_5pct"] == (abs(z) > 1.96)


def test_ad2s_rle_rebuild(spark):
    """Scholz-Stephens A2akN vs a literal float transcription of
    JASA 1987 eq. 6 + the a/b/c/d variance polynomial (independent
    of the engine's exact-long scaling), and the RLE audit vs a
    straight python run count."""
    from mpds_spark.queries import (
        q_anderson_darling_2s,
        q_rle_compressibility,
    )

    ra = q_anderson_darling_2s(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rl = q_rle_compressibility(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CASE WHEN isodow(date_trunc('day', ts)) >= 6"
        " THEN 1 ELSE 0 END AS we, count(*) AS y FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY date_trunc('day', ts)"
    ).fetchall()
    samples = [
        [y for w, y in rows if w == 1],
        [y for w, y in rows if w == 0],
    ]
    pooled = sorted(y for _, y in rows)
    n = len(pooled)
    k = 2
    zs = sorted(set(pooled))
    a2 = 0.0
    for i, sample in enumerate(samples):
        ni = len(sample)
        inner = 0.0
        for z in zs:
            lj = pooled.count(z)
            fij = sample.count(z)
            cj = sum(1 for v in pooled if v <= z)
            fcum = sum(1 for v in sample if v <= z)
            ba = cj - lj / 2.0
            ma = fcum - fij / 2.0
            den = ba * (n - ba) - n * lj / 4.0
            inner += (lj / n) * (n * ma - ni * ba) ** 2 / den
        a2 += inner / ni
    a2 *= (n - 1) / n
    h = sum(1.0 / i for i in range(1, n))
    g = sum(
        1.0 / ((n - i) * j)
        for i in range(1, n - 1)
        for j in range(i + 1, n)
    )
    hh = sum(1.0 / len(s) for s in samples)
    av = (4 * g - 6) * (k - 1) + (10 - 6 * g) * hh
    bv = (
        (2 * g - 4) * k * k + 8 * h * k
        + (2 * g - 14 * h - 4) * hh - 8 * h + 4 * g - 6
    )
    cv = (
        (6 * h + 2 * g - 2) * k * k + (4 * h - 4 * g + 6) * k
        + (2 * h - 6) * hh + 4 * h
    )
    dv = (2 * h + 6) * k * k - 4 * h * k
    var = (av * n ** 3 + bv * n * n + cv * n + dv) / (
        (n - 1) * (n - 2) * (n - 3)
    )
    t = (a2 - (k - 1)) / var ** 0.5
    assert ra["n_days"] == n
    assert abs(ra["a2_stat"] - a2) < 1e-6
    assert abs(ra["sigma"] - var ** 0.5) < 1e-6
    assert abs(ra["t_stat"] - t) < 1e-5
    assert ra["reject_5pct"] == (t > 1.960)
    # RLE rebuild
    ev = duckdb.sql(
        "SELECT user_id, event_type FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    from collections import defaultdict

    seqs = defaultdict(list)
    for u, t_ in ev:
        seqs[u].append(t_)
    runs = sum(
        1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
        for s in seqs.values()
    )
    dist = sum(len(set(s)) for s in seqs.values())
    assert rl["n_users"] == len(seqs)
    assert rl["n_rows"] == len(ev)
    assert rl["runs_timeorder"] == runs
    assert rl["runs_sorted"] == dist
    assert rl["runs_sorted"] <= rl["runs_timeorder"]
    assert abs(rl["sort_benefit"] - runs / dist) < 1e-6


def test_bm_cucconi_rebuild(spark):
    """Brunner-Munzel vs the lawstat-style float construction
    (plain midranks, no integer clearing) and Cucconi vs the
    Marozzi 2009 float formulas."""
    from mpds_spark.queries import q_brunner_munzel, q_cucconi_test

    rb = q_brunner_munzel(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rc = q_cucconi_test(spark, "/root/testdata/sf0.001").collect()[0]
    import duckdb

    rows = duckdb.sql(
        "SELECT CASE WHEN isodow(date_trunc('day', ts)) >= 6"
        " THEN 1 ELSE 0 END AS we, count(*) AS y FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY date_trunc('day', ts)"
    ).fetchall()
    x = [y for w, y in rows if w == 1]  # weekend
    yv = [y for w, y in rows if w == 0]  # weekday
    n1, n2 = len(x), len(yv)
    nn = n1 + n2
    pooled = x + yv

    def midrank(vals, v):
        return sum(1 for u in vals if u < v) + (
            sum(1 for u in vals if u == v) + 1
        ) / 2.0

    r1 = [midrank(pooled, v) for v in x]
    r2 = [midrank(pooled, v) for v in yv]
    ri1 = [midrank(x, v) for v in x]
    ri2 = [midrank(yv, v) for v in yv]
    r1m, r2m = sum(r1) / n1, sum(r2) / n2
    v1 = sum(
        (r1[i] - ri1[i] - r1m + (n1 + 1) / 2.0) ** 2
        for i in range(n1)
    ) / (n1 - 1)
    v2 = sum(
        (r2[i] - ri2[i] - r2m + (n2 + 1) / 2.0) ** 2
        for i in range(n2)
    ) / (n2 - 1)
    stat = (
        n1 * n2 * (r2m - r1m)
        / (nn * (n1 * v1 + n2 * v2) ** 0.5)
    )
    df = (n1 * v1 + n2 * v2) ** 2 / (
        (n1 * v1) ** 2 / (n1 - 1) + (n2 * v2) ** 2 / (n2 - 1)
    )
    phat = (r2m - (n2 + 1) / 2.0) / n1
    assert rb["n_weekend"] == n1
    assert rb["n_weekday"] == n2
    assert abs(rb["p_weekday_busier"] - phat) < 1e-6
    assert abs(rb["bm_stat"] - stat) < 1e-6
    assert abs(rb["df_welch"] - df) < 1e-4
    assert rb["reject_5pct"] == (abs(stat) > 1.96)
    # Cucconi on weekend ranks
    sr2 = sum(midrank(pooled, v) ** 2 for v in x)
    sc2 = sum((nn + 1 - midrank(pooled, v)) ** 2 for v in x)
    den = (
        n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0
    ) ** 0.5
    u = (6 * sr2 - n1 * (nn + 1) * (2 * nn + 1)) / den
    v = (6 * sc2 - n1 * (nn + 1) * (2 * nn + 1)) / den
    rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert abs(rc["u_stat"] - u) < 1e-6
    assert abs(rc["v_stat"] - v) < 1e-6
    assert abs(rc["rho"] - rho) < 1e-6
    assert abs(rc["c_stat"] - c) < 1e-6
    assert rc["c_stat"] >= 0.0
    assert rc["reject_5pct"] == (c > 2.995732)


def test_zeroinfl_laplace_rebuild(spark):
    """van den Broek score statistic and the Laplace U vs literal
    float rebuilds from the raw stream (python floats, no decimal
    path), plus centroid_frac in (0, 1)."""
    from mpds_spark.queries import q_laplace_trend, q_zero_inflation

    rz = q_zero_inflation(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rl = q_laplace_trend(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    import math

    import duckdb

    xs = [
        t[0]
        for t in duckdb.sql(
            "SELECT sum(CASE WHEN event_type = 'purchase' THEN 1"
            " ELSE 0 END) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY user_id"
        ).fetchall()
    ]
    n = len(xs)
    n0 = sum(1 for x in xs if x == 0)
    lam = sum(xs) / n
    p0 = math.exp(-lam)
    stat = (n0 - n * p0) ** 2 / (
        n * p0 * (1 - p0) - n * lam * p0 * p0
    )
    assert rz["n_users"] == n
    assert rz["n_zero"] == n0
    assert abs(rz["lambda_hat"] - lam) < 1e-6
    assert abs(rz["expected_zeros"] - n * p0) < 1e-5
    assert abs(rz["score_stat"] - stat) < 1e-5
    assert rz["reject_5pct"] == (stat > 3.841459)
    # Laplace
    us = [
        t[0]
        for t in duckdb.sql(
            "SELECT epoch_us(ts) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
        ).fetchall()
    ]
    m = len(us)
    mn, mx = min(us), max(us)
    frac = (sum(us) - m * mn) / m / (mx - mn)
    z = math.sqrt(12 * m) * (frac - 0.5)
    assert rl["n_events"] == m
    assert abs(rl["window_days"] - (mx - mn) / 86400e6) < 1e-6
    assert 0.0 < rl["centroid_frac"] < 1.0
    assert abs(rl["centroid_frac"] - frac) < 1e-6
    assert abs(rl["laplace_u"] - z) < 1e-6
    assert rl["reject_5pct"] == (abs(z) > 1.96)


def test_zonemap_cdc_rebuild(spark):
    """Zone-map scan fractions vs a python rebuild of the binning
    arithmetic, and CDC chunking vs a literal python rolling-hash
    chunker (boundary invariance checked by construction)."""
    from mpds_spark.queries import q_cdc_chunking, q_zonemap_skipping

    rz = q_zonemap_skipping(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rc = {
        r["source"]: r
        for r in q_cdc_chunking(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    rows = duckdb.sql(
        "SELECT CAST(epoch_us(ts) AS DOUBLE)/1000000, day(ts),"
        " user_id FROM '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    mn = min(r[0] for r in rows)
    mx = max(r[0] for r in rows)
    ndays = len({r[1] for r in rows})
    from collections import defaultdict

    tb, hb = defaultdict(list), defaultdict(list)
    for sec, day, uid in rows:
        tb[min(31, int((sec - mn) * 32.0 / (mx - mn)))].append(day)
        hb[uid % 32].append(day)
    scan_t = sum(max(v) - min(v) + 1 for v in tb.values())
    scan_h = sum(max(v) - min(v) + 1 for v in hb.values())
    ft = scan_t / (ndays * len(tb))
    fh = scan_h / (ndays * len(hb))
    assert rz["n_bins"] == len(tb)
    assert rz["n_days"] == ndays
    assert abs(rz["scan_frac_time_layout"] - ft) < 1e-6
    assert abs(rz["scan_frac_hash_layout"] - fh) < 1e-6
    assert rz["scan_frac_time_layout"] <= rz["scan_frac_hash_layout"]
    # CDC chunker rebuild
    POW = [31 ** k for k in range(8)]

    def chunks(text):
        n = len(text)
        if n < 8:
            return [text] if text else [text]
        bounds = []
        for i in range(8, n + 1):  # 1-based position i
            h = sum(
                ord(text[i - 1 - k]) * POW[k] for k in range(8)
            )
            if h % 64 == 0:
                bounds.append(i)
        starts = [0] + bounds
        out = []
        for j in range(len(starts)):
            if j + 1 < len(starts):
                out.append(text[starts[j] : starts[j + 1]])
            elif starts[j] < n:
                out.append(text[starts[j] :])
        return out

    docs = duckdb.sql(
        "SELECT source, text FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
        " WHERE CAST(('0x' || substring(md5('cdc|' ||"
        " CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
        " % 4 = 0"
    ).fetchall()
    per = defaultdict(lambda: [0, set(), 0])
    for src_, text in docs:
        for c in chunks(text):
            per[src_][0] += 1
            per[src_][1].add(c)
            per[src_][2] += len(c)
    for src_, (n, dset, tot) in per.items():
        r = rc[src_]
        assert r["n_chunks"] == n
        assert r["distinct_chunks"] == len(dset)
        assert abs(r["avg_chunk_chars"] - tot / n) < 1e-6
        assert abs(
            r["dup_chunk_rate"] - (n - len(dset)) / n
        ) < 1e-6


def test_seasonal_kendall_partial_corr_rebuild(spark):
    """Hirsch-Slack seasonal Kendall vs a per-season literal MK
    rebuild (independent tie handling via Counter), and the
    partial correlation vs numpy-free float Pearson algebra."""
    from mpds_spark.queries import (
        q_partial_correlation,
        q_seasonal_kendall,
    )

    rs = q_seasonal_kendall(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rp = q_partial_correlation(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import duckdb
    from collections import Counter, defaultdict

    rows = duckdb.sql(
        "SELECT isodow(date_trunc('day', ts)) AS g, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY date_trunc('day', ts)"
        " ORDER BY date_trunc('day', ts)"
    ).fetchall()
    seasons = defaultdict(list)
    for g, y in rows:
        seasons[g].append(y)
    s_tot, var_tot = 0, 0.0
    for ys in seasons.values():
        n = len(ys)
        s_tot += sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(ys)
        var_tot += (
            n * (n - 1) * (2 * n + 5)
            - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        ) / 18.0
    z = (s_tot - (1 if s_tot > 0 else -1 if s_tot < 0 else 0)) / (
        var_tot ** 0.5
    )
    assert rs["n_days"] == len(rows)
    assert rs["s_stat"] == s_tot
    assert abs(rs["var_s"] - var_tot) < 1e-6
    assert abs(rs["z_stat"] - z) < 1e-6
    assert rs["reject_5pct"] == (abs(z) > 1.96)
    # partial correlation rebuild
    rows = duckdb.sql(
        "SELECT day(ts), count(*), sum(CASE WHEN"
        " event_type = 'purchase' THEN 1 ELSE 0 END) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts)"
    ).fetchall()
    zs = [float(r[0]) for r in rows]
    xs = [float(r[1]) for r in rows]
    ys = [float(r[2]) for r in rows]
    n = len(rows)

    def pearson(a, b):
        ma, mb = sum(a) / n, sum(b) / n
        num = sum((u - ma) * (v - mb) for u, v in zip(a, b))
        da = sum((u - ma) ** 2 for u in a) ** 0.5
        db = sum((v - mb) ** 2 for v in b) ** 0.5
        return num / (da * db)

    rxy = pearson(xs, ys)
    rxz = pearson(xs, zs)
    ryz = pearson(ys, zs)
    rpart = (rxy - rxz * ryz) / (
        (1 - rxz * rxz) * (1 - ryz * ryz)
    ) ** 0.5
    t = rpart * ((n - 3) / (1 - rpart * rpart)) ** 0.5
    assert rp["n_days"] == n
    assert abs(rp["r_raw"] - rxy) < 1e-6
    assert abs(rp["r_partial"] - rpart) < 1e-6
    assert abs(rp["t_stat"] - t) < 1e-5
    assert -1.0 <= rp["r_partial"] <= 1.0
    assert rp["reject_5pct"] == (abs(t) > 1.96)


def test_siegel_seasonal_sen_rebuild(spark):
    """Siegel repeated median and the seasonal Sen slope vs
    statistics.median over literally enumerated slope sets, plus a
    planted-outlier robustness check of the repeated median."""
    from mpds_spark.queries import (
        q_seasonal_sen_slope,
        q_siegel_slopes,
    )

    rs = q_siegel_slopes(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rn = q_seasonal_sen_slope(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import statistics

    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    days = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    n = len(ys)
    meds = [
        statistics.median(
            (ys[j] - ys[i]) / (days[j] - days[i])
            for j in range(n)
            if j != i
        )
        for i in range(n)
    ]
    siegel = statistics.median(meds)
    ts = statistics.median(
        (ys[j] - ys[i]) / (days[j] - days[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert rs["n_days"] == n
    assert abs(rs["siegel_slope"] - siegel) < 1e-6
    assert abs(rs["theil_sen_slope"] - ts) < 1e-6
    # repeated median shrugs off a wild day: replace the last day
    # with 100x its volume and check the python siegel moves little
    ys2 = ys[:-1] + [ys[-1] * 100]
    meds2 = [
        statistics.median(
            (ys2[j] - ys2[i]) / (days[j] - days[i])
            for j in range(n)
            if j != i
        )
        for i in range(n)
    ]
    siegel2 = statistics.median(meds2)
    spread = max(ys) - min(ys)
    assert abs(siegel2 - siegel) < spread  # bounded influence
    # seasonal Sen rebuild
    rows = duckdb.sql(
        "SELECT CAST(date_diff('day', DATE '2024-01-01',"
        " CAST(date_trunc('day', ts) AS DATE)) AS BIGINT),"
        " isodow(date_trunc('day', ts)), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY date_trunc('day', ts)"
        " ORDER BY 1"
    ).fetchall()
    slopes = [
        (rows[j][2] - rows[i][2]) / (rows[j][0] - rows[i][0])
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if rows[j][1] == rows[i][1]
    ]
    assert rn["n_days"] == len(rows)
    assert rn["n_pairs"] == len(slopes)
    assert abs(
        rn["seasonal_sen_slope"] - statistics.median(slopes)
    ) < 1e-6


def test_dl_poisson_rate_rebuild(spark):
    """DerSimonian-Laird pooling vs a literal metafor-style float
    rebuild (statistics.mean/variance per stratum) and the
    conditional Poisson rate test vs textbook formulas."""
    from mpds_spark.queries import (
        q_dersimonian_laird,
        q_poisson_rate_test,
    )

    rd = q_dersimonian_laird(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rp = q_poisson_rate_test(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import math
    import statistics

    import duckdb

    rows = duckdb.sql(
        "SELECT (day(date_trunc('day', ts)) - 1) // 7 AS w,"
        " CASE WHEN isodow(date_trunc('day', ts)) >= 6 THEN 1"
        " ELSE 0 END AS we, count(*) AS y FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " WHERE day(ts) <= 28"
        " GROUP BY date_trunc('day', ts) ORDER BY 1"
    ).fetchall()
    ds, vs = [], []
    for w in range(4):
        g1 = [y for ww, we, y in rows if ww == w and we == 1]
        g2 = [y for ww, we, y in rows if ww == w and we == 0]
        if len(g1) < 2 or len(g2) < 2:
            continue
        d = statistics.mean(g1) - statistics.mean(g2)
        v = statistics.variance(g1) / len(g1) + statistics.variance(
            g2
        ) / len(g2)
        if v > 0:
            ds.append(d)
            vs.append(v)
    k = len(ds)
    sw = sum(1 / v for v in vs)
    sw2 = sum(1 / v / v for v in vs)
    fe = sum(d / v for d, v in zip(ds, vs)) / sw
    q = sum((d - fe) ** 2 / v for d, v in zip(ds, vs))
    tau2 = max(0.0, (q - (k - 1)) / (sw - sw2 / sw))
    re = sum(d / (v + tau2) for d, v in zip(ds, vs)) / sum(
        1 / (v + tau2) for v in vs
    )
    i2 = max(0.0, (q - (k - 1)) / q)
    assert rd["n_strata"] == k
    assert abs(rd["fixed_effect"] - fe) < 1e-5
    assert abs(rd["random_effect"] - re) < 1e-5
    assert abs(rd["cochran_q"] - q) < 1e-5
    assert abs(rd["tau2"] - tau2) < 1e-5
    assert abs(rd["i2"] - i2) < 1e-6
    assert 0.0 <= rd["i2"] < 1.0
    assert rd["heterogeneous_5pct"] == (q > 7.814728)
    # poisson rate rebuild
    rows = duckdb.sql(
        "SELECT CASE WHEN isodow(date_trunc('day', ts)) >= 6"
        " THEN 1 ELSE 0 END AS we,"
        " sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " FROM '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY date_trunc('day', ts)"
    ).fetchall()
    n1 = sum(1 for we, _ in rows if we == 1)
    n2 = len(rows) - n1
    x1 = sum(x for we, x in rows if we == 1)
    x2 = sum(x for we, x in rows if we == 0)
    w = n1 / (n1 + n2)
    x = x1 + x2
    z = (x1 - x * w) / math.sqrt(x * w * (1 - w))
    rr = (x1 / n1) / (x2 / n2)
    se = math.sqrt(1 / x1 + 1 / x2)
    assert rp["n1_days"] == n1 and rp["n2_days"] == n2
    assert rp["x1"] == x1 and rp["x2"] == x2
    assert abs(rp["z_stat"] - z) < 1e-6
    assert abs(rp["rate_ratio"] - rr) < 1e-6
    assert abs(rp["rr_lo95"] - rr * math.exp(-1.96 * se)) < 1e-5
    assert abs(rp["rr_hi95"] - rr * math.exp(1.96 * se)) < 1e-5
    assert rp["rr_lo95"] <= rp["rate_ratio"] <= rp["rr_hi95"]
    assert rp["reject_5pct"] == (abs(z) > 1.96)


def test_pwmk_kupiec_rebuild(spark):
    """TFPW Mann-Kendall vs a literal float rebuild (numpy-free
    r1, prewhitening and tie-corrected MK) and the Kupiec POF LR
    vs the textbook binomial likelihood ratio."""
    from mpds_spark.queries import q_kupiec_pof, q_prewhitened_mk

    rm = q_prewhitened_mk(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rk = q_kupiec_pof(spark, "/root/testdata/sf0.001").collect()[0]
    import math
    from collections import Counter

    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    ybar = sum(ys) / n
    r1 = sum(
        (ys[t] - ybar) * (ys[t - 1] - ybar) for t in range(1, n)
    ) / sum((y - ybar) ** 2 for y in ys)
    yp = [ys[t] - r1 * ys[t - 1] for t in range(1, n)]

    def mk(vals):
        m = len(vals)
        s = sum(
            (vals[j] > vals[i]) - (vals[j] < vals[i])
            for i in range(m)
            for j in range(i + 1, m)
        )
        ties = Counter(vals)
        var = (
            m * (m - 1) * (2 * m + 5)
            - sum(
                t * (t - 1) * (2 * t + 5) for t in ties.values()
            )
        ) / 18.0
        z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / var ** 0.5
        return s, z

    sr, zr = mk(ys)
    sp, zp = mk(yp)
    assert rm["n_days"] == n
    assert abs(rm["lag1_autocorr"] - r1) < 1e-6
    assert rm["s_raw"] == sr
    assert abs(rm["z_raw"] - zr) < 1e-6
    assert rm["s_prewhitened"] == sp
    assert abs(rm["z_prewhitened"] - zp) < 1e-6
    assert rm["reject_5pct"] == (abs(zp) > 1.96)
    # Kupiec rebuild
    cs = [
        (d, round(v * 100))
        for d, v in duckdb.sql(
            "SELECT day(ts), value FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " WHERE event_type = 'purchase'"
        ).fetchall()
    ]
    ins = sorted(c for d, c in cs if d <= 7)
    thr = ins[-(-19 * len(ins) // 20) - 1]
    oos = [c for d, c in cs if d > 7]
    nn, x = len(oos), sum(1 for c in oos if c > thr)
    p = 0.05
    lr = -2 * (
        (nn - x) * math.log(1 - p)
        + x * math.log(p)
        - ((nn - x) * math.log(1 - x / nn) if x < nn else 0.0)
        - (x * math.log(x / nn) if x > 0 else 0.0)
    )
    assert abs(rk["threshold_dollars"] - thr / 100.0) < 1e-9
    assert rk["m_insample"] == len(ins)
    assert rk["n_oos"] == nn
    assert rk["x_exceed"] == x
    assert abs(rk["lr_pof"] - lr) < 1e-5
    assert rk["lr_pof"] >= 0.0
    assert rk["reject_5pct"] == (lr > 3.841459)


def test_chow_hlci_rebuild(spark):
    """Chow F vs three literal float OLS fits and the Moses CI vs
    a sorted-difference rebuild with the same k formula."""
    from mpds_spark.queries import q_chow_test, q_hodges_lehmann_ci

    rc = q_chow_test(spark, "/root/testdata/sf0.001").collect()[0]
    rh = q_hodges_lehmann_ci(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import math

    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()

    def sse(pts):
        nn = len(pts)
        mx = sum(x for x, _ in pts) / nn
        my = sum(y for _, y in pts) / nn
        sxx = sum((x - mx) ** 2 for x, _ in pts)
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        syy = sum((y - my) ** 2 for _, y in pts)
        return syy - sxy * sxy / sxx

    n = len(rows)
    ssep = sse(rows)
    s1 = sse([r for r in rows if r[0] <= 15])
    s2 = sse([r for r in rows if r[0] > 15])
    f = ((ssep - s1 - s2) / 2.0) / ((s1 + s2) / (n - 4))
    assert rc["n_days"] == n
    assert abs(rc["sse_pooled"] - ssep) < max(1e-4, ssep * 1e-9)
    assert abs(rc["sse_split"] - (s1 + s2)) < max(
        1e-4, (s1 + s2) * 1e-9
    )
    assert abs(rc["f_stat"] - f) < 1e-5
    assert rc["reject_5pct"] == (f > 3.354)
    # Moses CI rebuild
    ys = [y for _, y in rows]
    h = n // 2
    diffs = sorted(
        ys[j] - ys[i] for i in range(h) for j in range(h, n)
    )
    npair = len(diffs)
    k = math.floor(
        npair / 2.0 - 1.96 * math.sqrt(npair * (n + 1) / 12.0)
    )
    assert rh["n_pairs"] == npair
    assert rh["k_rank"] == k
    assert rh["ci_lo"] == diffs[k - 1]
    assert rh["ci_hi"] == diffs[npair - k]
    assert rh["ci_lo"] <= rh["hl_shift"] <= rh["ci_hi"]
    assert rh["excludes_zero"] == (
        rh["ci_lo"] > 0 or rh["ci_hi"] < 0
    )


def test_mcc_pinball_rebuild(spark):
    """MCC/F1 vs sklearn-free cell arithmetic and the pinball loss
    vs a float expanding-quantile rebuild."""
    from mpds_spark.queries import q_mcc_confusion, q_pinball_loss

    rm = q_mcc_confusion(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rp = q_pinball_loss(spark, "/root/testdata/sf0.001").collect()[0]
    import math

    import duckdb

    rows = duckdb.sql(
        "SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END,"
        " CASE WHEN len(regexp_split_to_array(trim(text),"
        " '\\s+')) >= 50 THEN 1 ELSE 0 END FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    tp = sum(1 for p, y in rows if p and y)
    fp = sum(1 for p, y in rows if p and not y)
    fn = sum(1 for p, y in rows if not p and y)
    tn = sum(1 for p, y in rows if not p and not y)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert (rm["tp"], rm["fp"], rm["fn"], rm["tn"]) == (
        tp, fp, fn, tn,
    )
    assert abs(rm["mcc"] - mcc) < 1e-6
    assert -1.0 <= rm["mcc"] <= 1.0
    assert abs(
        rm["f1"] - 2 * tp / (2 * tp + fp + fn)
    ) < 1e-6
    # pinball rebuild
    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    tot, cov = 0.0, 0
    for t in range(7, n):
        hist = sorted(ys[:t])
        f = hist[-(-9 * t // 10) - 1]
        y = ys[t]
        tot += 0.9 * (y - f) if y >= f else 0.1 * (f - y)
        cov += 1 if y <= f else 0
    m = n - 7
    assert rp["n_forecasts"] == m
    assert abs(rp["mean_pinball_09"] - tot / m) < 1e-6
    assert abs(rp["coverage"] - cov / m) < 1e-6
    assert 0.0 <= rp["coverage"] <= 1.0


def test_deviance_collision_rebuild(spark):
    """Poisson deviance vs a literal float fold and the birthday
    audit vs hashlib-truncated slot counting with the closed-form
    expectation."""
    from mpds_spark.queries import (
        q_hash_collision_audit,
        q_poisson_deviance_gof,
    )

    rd = q_poisson_deviance_gof(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rh = q_hash_collision_audit(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import hashlib
    import math

    import duckdb

    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    mu = sum(ys) / n
    g = 2 * sum(
        (mu if y == 0 else y * math.log(y / mu) - (y - mu))
        for y in ys
    )
    assert rd["n_days"] == n
    assert abs(rd["mean_rate"] - mu) < 1e-6
    assert abs(rd["deviance_g"] - g) < 1e-5
    assert abs(rd["deviance_per_df"] - g / (n - 1)) < 1e-6
    assert rd["deviance_g"] >= 0.0
    assert rd["reject_5pct"] == (g > 43.773)
    # collision audit rebuild
    ids = [
        t[0]
        for t in duckdb.sql(
            "SELECT doc_id FROM"
            " '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    ]
    slots = {
        int(hashlib.md5(str(i).encode()).hexdigest()[:5], 16)
        for i in ids
    }
    nn, m = len(ids), 1 << 20
    ed = m * (1 - math.exp(nn * math.log(1 - 1 / m)))
    assert rh["n_keys"] == nn
    assert rh["observed_distinct"] == len(slots)
    assert abs(rh["expected_distinct"] - ed) < 1e-4
    assert rh["observed_collisions"] == nn - len(slots)
    assert abs(
        rh["collision_ratio"]
        - (nn - len(slots)) / (nn - ed)
    ) < 1e-4


def test_ewma_we_rules_rebuild(spark):
    """EWMA chart vs a python recursion with steady-state limits,
    and the Western Electric rule counts vs literal window sweeps."""
    from mpds_spark.queries import (
        q_ewma_control_chart,
        q_western_electric_rules,
    )

    re_ = q_ewma_control_chart(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rw = q_western_electric_rules(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import math

    import duckdb

    rows = duckdb.sql(
        "SELECT day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    days = [d for d, _ in rows]
    ys = [y for _, y in rows]
    n = len(ys)
    mu = sum(ys) / n
    sig = math.sqrt(sum((y - mu) ** 2 for y in ys) / n)
    hw = 3 * sig * math.sqrt(0.2 / 1.8)
    z, sigs, first = mu, 0, None
    for d, y in rows:
        z = 0.2 * y + 0.8 * z
        if z > mu + hw or z < mu - hw:
            sigs += 1
            if first is None:
                first = d
    assert re_["n_days"] == n
    assert abs(re_["center_line"] - mu) < 1e-6
    assert abs(re_["ucl"] - (mu + hw)) < 1e-6
    assert abs(re_["lcl"] - (mu - hw)) < 1e-6
    assert abs(re_["final_ewma"] - z) < 1e-6
    assert re_["n_signals"] == sigs
    assert re_["first_signal_day"] == first
    # WE rules rebuild
    zs = [(y - mu) / sig for y in ys]
    r1 = sum(1 for v in zs if abs(v) > 3)
    def rule(width, th, need):
        c = 0
        for t in range(width - 1, n):
            w = zs[t - width + 1 : t + 1]
            if (
                sum(1 for v in w if v > th) >= need
                or sum(1 for v in w if v < -th) >= need
            ):
                c += 1
        return c

    assert rw["rule1_beyond_3sigma"] == r1
    assert rw["rule2_2of3_beyond_2sigma"] == rule(3, 2.0, 2)
    assert rw["rule3_4of5_beyond_1sigma"] == rule(5, 1.0, 4)
    assert rw["rule4_8_same_side"] == rule(8, 0.0, 8)


def test_lz_flatness_rebuild(spark):
    """LZ production parse vs a literal python parser with the
    same phrase rule (checked on the Kaspar-Schuster example
    string too) and spectral flatness vs a numpy-free DFT."""
    from mpds_spark.queries import q_lz_complexity, q_spectral_flatness

    rl = q_lz_complexity(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rf = q_spectral_flatness(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    import math

    import duckdb

    def lz76(s):
        c, p, j = 0, 1, 1
        m = len(s)
        while j <= m:
            if s[p - 1 : j] in s[: j - 1]:
                j += 1
            else:
                c += 1
                p = j + 1
                j = p
        if p <= m:
            c += 1
        return c

    # the production parse grows phrase-by-phrase; sanity on a
    # periodic and a balanced string
    assert lz76("0000000000") < lz76("0110100110")
    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    s = "".join(
        "1" if ys[t] > ys[t - 1] else "0" for t in range(1, len(ys))
    )
    c = lz76(s)
    m = len(s)
    assert rl["n_steps"] == m
    assert rl["n_phrases"] == c
    assert abs(rl["lz_norm"] - c * math.log2(m) / m) < 1e-6
    # flatness rebuild
    n = len(ys)
    mu = sum(ys) / n
    ps = []
    for k in range(1, n // 2 + 1):
        a = sum(
            (ys[t - 1] - mu) * math.cos(2 * math.pi * k * t / n)
            for t in range(1, n + 1)
        )
        b = sum(
            (ys[t - 1] - mu) * math.sin(2 * math.pi * k * t / n)
            for t in range(1, n + 1)
        )
        ps.append(a * a + b * b)
    flat = math.exp(
        sum(math.log(p) for p in ps) / len(ps)
    ) / (sum(ps) / len(ps))
    assert rf["n_freqs"] == len(ps)
    assert abs(rf["spectral_flatness"] - flat) < 1e-6
    assert 0.0 < rf["spectral_flatness"] <= 1.0 + 1e-9


def test_readability_powerlaw_rebuild(spark):
    """Flesch/fog vs a literal python syllable counter and the CSN
    alpha vs the closed-form MLE on raw counts."""
    import math
    import re as re_mod

    import duckdb

    from mpds_spark.queries import (
        q_powerlaw_mle,
        q_readability_scores,
    )

    rr = {
        r["source"]: r
        for r in q_readability_scores(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    rp = q_powerlaw_mle(spark, "/root/testdata/sf0.001").collect()[0]
    docs = duckdb.sql(
        "SELECT source, text FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    agg = {}
    for src_, text in docs:
        a = agg.setdefault(src_, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += max(1, sum(text.count(ch) for ch in ".!?"))
        for w in text.strip().split():
            syl = max(
                1, len(re_mod.findall(r"[aeiouy]+", w.lower()))
            )
            a[2] += 1
            a[3] += syl
            a[4] += 1 if syl >= 3 else 0
    for src_, (nd, sent, wc, syls, cpx) in agg.items():
        r = rr[src_]
        assert r["n_docs"] == nd
        assert r["n_sentences"] == sent
        assert r["n_words"] == wc
        assert r["n_syllables"] == syls
        assert r["n_complex_words"] == cpx
        flesch = 206.835 - 1.015 * (wc / sent) - 84.6 * (syls / wc)
        fog = 0.4 * ((wc / sent) + 100.0 * (cpx / wc))
        assert abs(r["flesch_ease"] - flesch) < 1e-5
        assert abs(r["gunning_fog"] - fog) < 1e-5
    # power-law rebuild
    xs = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY user_id"
        ).fetchall()
    ]
    tail = [x for x in xs if x >= 5]
    alpha = 1 + len(tail) / sum(math.log(x / 4.5) for x in tail)
    assert rp["n_users"] == len(xs)
    assert rp["n_tail"] == len(tail)
    assert abs(rp["alpha_hat"] - alpha) < 1e-6
    assert rp["alpha_hat"] > 1.0
    assert abs(
        rp["alpha_se"] - (alpha - 1) / math.sqrt(len(tail))
    ) < 1e-6


def test_dagostino_medcouple_rebuild(spark):
    """K^2 vs a literal float transcription of the 1990 Am. Stat.
    recipe and the medcouple vs a brute-force kernel median with
    the same no-tie variant."""
    import math
    import statistics

    import duckdb

    from mpds_spark.queries import q_dagostino_k2, q_medcouple

    rd = q_dagostino_k2(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rm = q_medcouple(spark, "/root/testdata/sf0.001").collect()[0]
    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    n = len(ys)
    mu = sum(ys) / n
    m2 = sum((y - mu) ** 2 for y in ys) / n
    m3 = sum((y - mu) ** 3 for y in ys) / n
    m4 = sum((y - mu) ** 4 for y in ys) / n
    g1 = m3 / m2 ** 1.5
    b2 = m4 / m2 ** 2
    yy = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2 * (beta2 - 1)) - 1
    delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2 / (w2 - 1))
    z1 = delta * math.log(
        yy / alpha + math.sqrt((yy / alpha) ** 2 + 1)
    )
    x = (b2 - 3.0 * (n - 1) / (n + 1)) / math.sqrt(
        24.0 * n * (n - 2) * (n - 3)
        / ((n + 1) ** 2 * (n + 3) * (n + 5))
    )
    sqb = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt(
            6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))
        )
    )
    aa = 6 + 8 / sqb * (2 / sqb + math.sqrt(1 + 4 / sqb ** 2))
    z2 = (
        (1 - 2 / (9 * aa))
        - ((1 - 2 / aa) / (1 + x * math.sqrt(2 / (aa - 2))))
        ** (1 / 3)
    ) / math.sqrt(2 / (9 * aa))
    k2 = z1 * z1 + z2 * z2
    assert rd["n_days"] == n
    assert abs(rd["skew_g1"] - g1) < 1e-6
    assert abs(rd["kurtosis_b2"] - b2) < 1e-6
    assert abs(rd["z_skew"] - z1) < 1e-5
    assert abs(rd["z_kurtosis"] - z2) < 1e-5
    assert abs(rd["k2_stat"] - k2) < 1e-4
    assert rd["reject_5pct"] == (k2 > 5.991465)
    # medcouple rebuild
    med = statistics.median(ys)
    hs = [
        ((xi + xj) - 2 * med) / (xi - xj)
        for xi in ys
        for xj in ys
        if xi > med and xj < med and xi != xj
    ]
    mc = statistics.median(hs)
    assert abs(rm["medcouple"] - mc) < 1e-6
    assert -1.0 <= rm["medcouple"] <= 1.0
    sv = sorted(ys)
    q1 = sv[-(-n // 4) - 1]
    q3 = sv[-(-3 * n // 4) - 1]
    assert rm["q1"] == q1 and rm["q3"] == q3
    iqr = q3 - q1
    if mc >= 0:
        lo = q1 - 1.5 * math.exp(-4 * mc) * iqr
        hi = q3 + 1.5 * math.exp(3 * mc) * iqr
    else:
        lo = q1 - 1.5 * math.exp(-3 * mc) * iqr
        hi = q3 + 1.5 * math.exp(4 * mc) * iqr
    assert abs(rm["fence_lo"] - lo) < 1e-5
    assert abs(rm["fence_hi"] - hi) < 1e-5
    assert rm["n_outliers"] == sum(
        1 for y in ys if y < lo or y > hi
    )


def test_hill_funnel_rebuild(spark):
    """Hill profile vs Counter arithmetic (with the q-monotonicity
    invariant q0 >= q1 >= q2 >= qinf) and the funnel audit vs a
    per-user float z rebuild."""
    import math
    from collections import Counter

    import duckdb

    from mpds_spark.queries import q_funnel_plot_audit, q_hill_numbers

    rh = q_hill_numbers(spark, "/root/testdata/sf0.001").collect()[0]
    rf = q_funnel_plot_audit(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    srcs = Counter(
        t[0]
        for t in duckdb.sql(
            "SELECT source FROM"
            " '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    )
    d = sum(srcs.values())
    h = -sum(c / d * math.log(c / d) for c in srcs.values())
    q2 = d * d / sum(c * c for c in srcs.values())
    assert rh["n_sources"] == len(srcs)
    assert rh["n_docs"] == d
    assert abs(rh["shannon_h"] - h) < 1e-6
    assert abs(rh["hill_q1"] - math.exp(h)) < 1e-5
    assert abs(rh["hill_q2"] - q2) < 1e-5
    assert abs(
        rh["hill_qinf"] - d / max(srcs.values())
    ) < 1e-6
    assert (
        rh["n_sources"] + 1e-9
        >= rh["hill_q1"] + 1e-9
        >= rh["hill_q2"]
        >= rh["hill_qinf"] - 1e-9
    )
    # funnel rebuild
    rows = duckdb.sql(
        "SELECT count(*), sum(CASE WHEN event_type = 'purchase'"
        " THEN 1 ELSE 0 END) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY user_id"
    ).fetchall()
    nn = sum(n for n, _ in rows)
    xx = sum(x for _, x in rows)
    p = xx / nn
    out, phis = 0, 0.0
    for n, x in rows:
        z = (x - n * p) / math.sqrt(n * p * (1 - p))
        phis += z * z
        if abs(z) > 1.96:
            out += 1
    assert rf["n_users"] == len(rows)
    assert abs(rf["pooled_rate"] - p) < 1e-6
    assert rf["n_outside_funnel"] == out
    assert abs(
        rf["overdispersion_phi"] - phis / len(rows)
    ) < 1e-5


def test_weighted_logrank_medianci_rebuild(spark):
    """Gehan/Tarone-Ware chi2 vs a literal float curve sweep, and
    the gap-time median + BC band vs an independently rebuilt KM
    with multiplicative survival products."""
    import hashlib
    import math
    from collections import defaultdict

    import duckdb

    from mpds_spark.queries import (
        q_median_survival_ci,
        q_weighted_logrank,
    )

    rw = q_weighted_logrank(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rm = q_median_survival_ci(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rows = duckdb.sql(
        "SELECT user_id, epoch(ts) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " WHERE event_type = 'purchase' ORDER BY user_id, ts,"
        " event_id"
    ).fetchall()
    mx = duckdb.sql(
        "SELECT max(epoch(ts)) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
    ).fetchall()[0][0]
    per = defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    spans = []
    for u, ts_ in per.items():
        arm = (
            int(
                hashlib.md5(f"lr|{u}".encode()).hexdigest()[:15], 16
            )
            % 2
        )
        for i, t in enumerate(ts_):
            nxt = ts_[i + 1] if i + 1 < len(ts_) else None
            day = math.floor(((nxt or mx) - t) / 3600.0)
            spans.append((day, 1 if nxt is not None else 0, arm))
    curve = defaultdict(lambda: [0, 0, 0, 0])
    for day, obs, arm in spans:
        c = curve[day]
        if arm == 1:
            c[0] += obs
            c[1] += 1 - obs
        else:
            c[2] += obs
            c[3] += 1 - obs
    days = sorted(curve)
    tot1 = sum(curve[d][0] + curve[d][1] for d in days)
    tott = sum(sum(curve[d]) for d in days)
    o1 = og = ot = v1 = vg = vt = 0.0
    n1, nt = tot1, tott
    for d in days:
        d1, c1, d0, c0 = curve[d]
        dd = d1 + d0
        if dd > 0:
            term = d1 - dd * n1 / nt
            o1 += term
            og += nt * term
            ot += math.sqrt(nt) * term
            if nt > 1:
                vv = (
                    dd * (n1 / nt) * ((nt - n1) / nt)
                    * ((nt - dd) / (nt - 1))
                )
                v1 += vv
                vg += nt * nt * vv
                vt += nt * vv
        n1 -= d1 + c1
        nt -= d1 + c1 + d0 + c0
    assert abs(rw["chi2_logrank"] - o1 * o1 / v1) < 1e-4
    assert abs(rw["chi2_gehan"] - og * og / vg) < 1e-4
    assert abs(rw["chi2_tarone_ware"] - ot * ot / vt) < 1e-4
    # median CI rebuild (pooled)
    pooled = defaultdict(lambda: [0, 0])
    for day, obs, _ in spans:
        pooled[day][0] += obs
        pooled[day][1] += 1 - obs
    days = sorted(pooled)
    at_risk = sum(sum(v) for v in pooled.values())
    s, gw = 1.0, 0.0
    scurve = []
    for d in days:
        dd, cc = pooled[d]
        if dd >= at_risk:
            s = 0.0
        else:
            s *= (at_risk - dd) / at_risk
            gw += dd / (at_risk * (at_risk - dd))
        scurve.append((d, s, gw))
        at_risk -= dd + cc
    med = next(d for d, s_, _ in scurve if s_ <= 0.5)
    band = [
        d
        for d, s_, g_ in scurve
        if abs(s_ - 0.5) <= 1.96 * s_ * math.sqrt(g_)
    ]
    assert abs(rm["median_days"] - med / 24.0) < 1e-6
    assert abs(rm["ci_lo_days"] - min(band) / 24.0) < 1e-6
    assert abs(rm["ci_hi_days"] - max(band) / 24.0) < 1e-6
    assert rm["n_band_bins"] == len(band)
    assert rm["ci_lo_days"] <= rm["median_days"] <= rm["ci_hi_days"]


def test_lorenz_records_rebuild(spark):
    """Lorenz asymmetry vs a literal sorted-values rebuild of
    Damgaard-Weiner eq. 3, and record counts vs a running-max
    python sweep with harmonic moments."""
    import math

    import duckdb

    from mpds_spark.queries import (
        q_lorenz_asymmetry,
        q_record_counts,
    )

    rl = q_lorenz_asymmetry(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rr = q_record_counts(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    xs = sorted(
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY user_id"
        ).fetchall()
    )
    n, tot = len(xs), sum(xs)
    mu = tot / n
    m = sum(1 for x in xs if x < mu)
    xm, xm1 = xs[m - 1], xs[m]
    delta = (mu - xm) / (xm1 - xm) if xm1 > xm else 0.0
    fmu = (m + delta) / n
    lmu = (sum(xs[:m]) + delta * xm1) / tot
    assert rl["n_users"] == n
    assert rl["total_events"] == tot
    assert abs(rl["f_at_mean"] - fmu) < 1e-6
    assert abs(rl["l_at_mean"] - lmu) < 1e-6
    assert abs(rl["lorenz_asymmetry"] - (fmu + lmu)) < 1e-6
    # records rebuild
    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    nd = len(ys)
    up = dn = 1
    mx, mn = ys[0], ys[0]
    for y in ys[1:]:
        if y > mx:
            up += 1
            mx = y
        if y < mn:
            dn += 1
            mn = y
    h1 = sum(1 / i for i in range(1, nd + 1))
    h2 = sum(1 / i / i for i in range(1, nd + 1))
    assert rr["n_days"] == nd
    assert rr["upper_records"] == up
    assert rr["lower_records"] == dn
    assert abs(rr["expected_records"] - h1) < 1e-6
    assert abs(
        rr["z_upper"] - (up - h1) / math.sqrt(h1 - h2)
    ) < 1e-6
    assert abs(
        rr["z_lower"] - (dn - h1) / math.sqrt(h1 - h2)
    ) < 1e-6


def test_wow_sign_wilcoxon_rebuild(spark):
    """Both week-over-week paired tests vs literal python rebuilds
    with float midranks and the scipy convention for ties."""
    import math

    import duckdb

    from mpds_spark.queries import (
        q_sign_test_wow,
        q_wilcoxon_signed_rank,
    )

    rs = q_sign_test_wow(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rw = q_wilcoxon_signed_rank(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    ys = [
        t[0]
        for t in duckdb.sql(
            "SELECT count(*) FROM"
            " '/root/testdata/sf0.001/events.parquet'"
            " GROUP BY day(ts) ORDER BY day(ts)"
        ).fetchall()
    ]
    d = [
        ys[t + 7] - ys[t]
        for t in range(len(ys) - 7)
        if ys[t + 7] != ys[t]
    ]
    m = len(d)
    sp = sum(1 for x in d if x > 0)
    z = (sp - m / 2 - 0.5 * (1 if sp > m / 2 else -1 if sp < m / 2 else 0)) / (
        math.sqrt(m) / 2
    )
    assert rs["n_pairs"] == m
    assert rs["n_up_pairs"] == sp
    assert abs(rs["z_stat"] - z) < 1e-6
    assert rs["reject_5pct"] == (abs(z) > 1.96)
    # wilcoxon
    absd = sorted(abs(x) for x in d)

    def midrank(v):
        lt = sum(1 for u in absd if u < v)
        eq = sum(1 for u in absd if u == v)
        return lt + (eq + 1) / 2.0

    w = sum(midrank(abs(x)) for x in d if x > 0)
    e = m * (m + 1) / 4.0
    from collections import Counter

    ties = Counter(abs(x) for x in d)
    var = m * (m + 1) * (2 * m + 1) / 24.0 - sum(
        t ** 3 - t for t in ties.values()
    ) / 48.0
    zw = (w - e) / math.sqrt(var)
    assert rw["n_pairs"] == m
    assert abs(rw["w_plus"] - w) < 1e-6
    assert abs(rw["e_w"] - e) < 1e-6
    assert abs(rw["var_w"] - var) < 1e-6
    assert abs(rw["z_stat"] - zw) < 1e-6
    assert rw["reject_5pct"] == (abs(zw) > 1.96)


def test_bg_cumperio_rebuild(spark):
    """Breusch-Godfrey LM vs a literal float OLS + partial-R^2
    rebuild and the cumulative periodogram vs a numpy-free DFT
    sweep."""
    import math

    import duckdb

    from mpds_spark.queries import (
        q_breusch_godfrey,
        q_cumulative_periodogram,
    )

    rb = q_breusch_godfrey(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rc = q_cumulative_periodogram(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rows = duckdb.sql(
        "SELECT day(ts), count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY day(ts) ORDER BY day(ts)"
    ).fetchall()
    xs = [float(d) for d, _ in rows]
    ys = [float(y) for _, y in rows]
    n = len(ys)
    mx, my = sum(xs) / n, sum(ys) / n
    b = sum(
        (x - mx) * (y - my) for x, y in zip(xs, ys)
    ) / sum((x - mx) ** 2 for x in xs)
    a = my - b * mx
    e = [y - a - b * x for x, y in zip(xs, ys)]
    resp, p1, p2 = e[1:], xs[1:], e[:-1]

    def corr(u, v):
        m = len(u)
        mu, mv = sum(u) / m, sum(v) / m
        return sum(
            (a_ - mu) * (b_ - mv) for a_, b_ in zip(u, v)
        ) / math.sqrt(
            sum((a_ - mu) ** 2 for a_ in u)
            * sum((b_ - mv) ** 2 for b_ in v)
        )

    r1, r2, r12 = corr(resp, p1), corr(resp, p2), corr(p1, p2)
    rsq = (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12) / (1 - r12 * r12)
    lm = len(resp) * rsq
    assert rb["n_days"] == n
    assert abs(rb["resid_lag1_corr"] - r2) < 1e-5
    assert abs(rb["aux_r2"] - rsq) < 1e-5
    assert abs(rb["lm_stat"] - lm) < 1e-4
    assert rb["reject_5pct"] == (lm > 3.841459)
    # cumulative periodogram
    mu = sum(ys) / n
    ps = []
    for k in range(1, n // 2 + 1):
        ca = sum(
            (ys[t - 1] - mu) * math.cos(2 * math.pi * k * t / n)
            for t in range(1, n + 1)
        )
        sa = sum(
            (ys[t - 1] - mu) * math.sin(2 * math.pi * k * t / n)
            for t in range(1, n + 1)
        )
        ps.append(ca * ca + sa * sa)
    tot = sum(ps)
    h = len(ps)
    devs = [
        abs(sum(ps[:k]) / tot - k / h) for k in range(1, h + 1)
    ]
    d = max(devs)
    kmax = devs.index(d) + 1
    assert rc["n_freqs"] == h
    assert abs(rc["max_deviation"] - d) < 1e-6
    assert rc["k_at_max"] == kmax
    assert abs(rc["crit_5pct"] - 1.36 / math.sqrt(h - 1)) < 1e-6
    assert rc["reject_5pct"] == (d > 1.36 / math.sqrt(h - 1))


def test_energy_bimodality_rebuild(spark):
    """Energy distance vs brute-force pairwise sums (plus E >= 0
    and e in [0,1]) and BC vs the SAS formula with
    statistics-module sample moments."""
    import math

    import duckdb

    from mpds_spark.queries import (
        q_bimodality_coefficient,
        q_energy_distance,
    )

    re_ = q_energy_distance(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    rb = q_bimodality_coefficient(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    rows = duckdb.sql(
        "SELECT CASE WHEN isodow(date_trunc('day', ts)) >= 6"
        " THEN 1 ELSE 0 END, count(*) FROM"
        " '/root/testdata/sf0.001/events.parquet'"
        " GROUP BY date_trunc('day', ts)"
    ).fetchall()
    xs = [y for w, y in rows if w == 1]
    ys = [y for w, y in rows if w == 0]
    exy = sum(abs(a - b) for a in xs for b in ys) / (
        len(xs) * len(ys)
    )
    exx = sum(abs(a - b) for a in xs for b in xs) / len(xs) ** 2
    eyy = sum(abs(a - b) for a in ys for b in ys) / len(ys) ** 2
    e = 2 * exy - exx - eyy
    assert abs(re_["mean_cross_dist"] - exy) < 1e-6
    assert abs(re_["energy_distance"] - e) < 1e-6
    assert re_["energy_distance"] >= -1e-9
    assert abs(re_["e_coefficient"] - e / (2 * exy)) < 1e-6
    assert -1e-9 <= re_["e_coefficient"] <= 1.0 + 1e-9
    # bimodality
    vals = [y for _, y in rows]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((v - mu) ** 2 for v in vals) / n
    m3 = sum((v - mu) ** 3 for v in vals) / n
    m4 = sum((v - mu) ** 4 for v in vals) / n
    b1 = m3 / m2 ** 1.5
    g1 = b1 * math.sqrt(n * (n - 1)) / (n - 2)
    b2 = m4 / m2 ** 2
    g2 = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * (b2 - 3) + 6)
    bc = (g1 * g1 + 1) / (
        g2 + 3 * (n - 1) ** 2 / ((n - 2) * (n - 3))
    )
    assert rb["n_days"] == n
    assert abs(rb["sample_skew_g1"] - g1) < 1e-6
    assert abs(rb["excess_kurtosis_g2"] - g2) < 1e-6
    assert abs(rb["bimodality_coef"] - bc) < 1e-6
    assert 0.0 < rb["bimodality_coef"] <= 1.0 + 1e-9


def test_lang_fertility_rebuild(spark):
    """Confusion cells vs a literal python marker classifier and
    fertility ratios vs Counter arithmetic; per-label shares sum
    to 1."""
    from collections import Counter, defaultdict

    import duckdb

    from mpds_spark.queries import (
        q_lang_confusion_audit,
        q_tokenizer_fertility,
    )

    rc = q_lang_confusion_audit(
        spark, "/root/testdata/sf0.001"
    ).collect()
    rf = {
        r["lang"]: r
        for r in q_tokenizer_fertility(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    docs = duckdb.sql(
        "SELECT lang, text FROM"
        " '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    markers = {
        "en": {"the", "and", "of", "to", "is"},
        "de": {"der", "die", "und", "ist", "das"},
        "fr": {"le", "la", "et", "est", "les"},
        "es": {"el", "la", "los", "es", "una"},
    }
    cells = Counter()
    for lang, text in docs:
        words = text.strip().split()
        hits = {
            lg: sum(1 for w in words if w in ms)
            for lg, ms in markers.items()
        }
        g = max(hits.values())
        pred = "und"
        if g > 0:
            for lg in ("en", "de", "fr", "es"):
                if hits[lg] == g:
                    pred = lg
                    break
        cells[(lang, pred)] += 1
    got = {(r["lang_label"], r["lang_pred"]): r["n_docs"] for r in rc}
    assert got == dict(cells)
    shares = defaultdict(float)
    for r in rc:
        shares[r["lang_label"]] += r["share_of_label"]
    for v in shares.values():
        assert abs(v - 1.0) < 1e-5
    # fertility
    agg = defaultdict(lambda: [0, 0, Counter()])
    for lang, text in docs:
        a = agg[lang]
        a[0] += 1
        a[1] += len(text)
        a[2].update(text.strip().split())
    for lang, (nd, chars, wc) in agg.items():
        r = rf[lang]
        tw = sum(wc.values())
        assert r["n_docs"] == nd
        assert r["n_words"] == tw
        assert r["n_word_types"] == len(wc)
        assert abs(r["chars_per_word"] - chars / tw) < 1e-6
        assert abs(r["type_token_ratio"] - len(wc) / tw) < 1e-6


def test_cdc_starts_kernel_edges():
    """The r6 vectorized boundary kernel (_cdc_starts) vs a literal
    per-position rolling-hash loop: empty / short / boundary-rich /
    non-ASCII BMP inputs. No Spark needed — the numpy body is called
    directly; exactness here is what keeps chunk identity (and the
    frozen oracle) byte-stable."""
    import pandas as pd

    from mpds_spark.queries import _cdc_starts

    POW = [31 ** k for k in range(8)]

    def ref_starts(text):
        n = len(text)
        if n < 8:
            return [0, n]
        bounds = []
        for i in range(8, n + 1):
            h = sum(ord(text[i - 1 - k]) * POW[k] for k in range(8))
            if h % 64 == 0:
                bounds.append(i)
        return [0] + bounds

    cases = [
        "",
        "a",
        "1234567",
        "12345678",
        "@" * 64,  # '@'=64: every window hash is 0 mod 64
        "the quick brown fox jumps over the lazy dog " * 20,
        "café naïve 世界 " * 40,
        "\x00\x01\x02\x03\x04\x05\x06\x07" * 16,
    ]
    got = _cdc_starts.func(pd.Series(cases))
    for text, arr in zip(cases, got):
        assert list(arr) == ref_starts(text), text[:32]


def test_cosine_nn1_arrow_matches_cosine_topk(spark):
    """The r6 vectorized 1-NN scorer must reproduce cosine_topk(k=1)
    bit-for-bit on the real embedding table: same neighbor, same
    cosine double, same tie-break — the bit-equality that keeps
    knn_eval's frozen oracle green."""
    from pyspark.sql import functions as F

    from mpds_spark.operators.similarity import (
        cosine_nn1_arrow,
        cosine_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    q = emb.filter(F.col("vec_id") % 4 == 0)
    ref = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in cosine_topk(emb, q, k=1).collect()
    }
    got = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in cosine_nn1_arrow(emb, q).collect()
    }
    assert set(ref) == set(got)
    for k in ref:
        assert ref[k][0] == got[k][0], k
        assert ref[k][1] == got[k][1], k  # bitwise-equal doubles


def test_lang_confusion_oracle_markers_synced():
    """SQL_LANG_CONFUSION_AUDIT hard-codes the marker word IN-lists and
    the en>de>fr>es tie-break inline; this pins them to
    operators/text.py LANG_MARKERS so a marker edit cannot silently
    desync engine and oracle until the gate run (ADVICE r5)."""
    import re

    from mpds_spark.operators.text import LANG_MARKERS
    from mpds_spark.queries import SQL_LANG_CONFUSION_AUDIT

    in_lists = re.findall(
        r"list_filter\(words, x -> x IN\s*\(([^)]*)\)",
        SQL_LANG_CONFUSION_AUDIT,
    )
    assert len(in_lists) == len(LANG_MARKERS)
    for (lang, markers), found in zip(LANG_MARKERS.items(), in_lists):
        got = [w.strip().strip("'") for w in found.split(",")]
        assert got == markers, (lang, got, markers)
    # tie-break order in the CASE chain must match dict order
    case_order = re.findall(r"WHEN n_(\w+) = g AND g > 0", SQL_LANG_CONFUSION_AUDIT)
    assert case_order == list(LANG_MARKERS)


def test_cosine_nn1_arrow_tie_break(spark):
    """Duplicate vectors force exact cosine ties: the Arrow 1-NN must
    pick the smallest neighbor id, matching cosine_topk's
    (cosine DESC, neighbor_id) row_number order."""
    from mpds_spark.operators.similarity import (
        cosine_nn1_arrow,
        cosine_topk,
    )

    rows = [
        (1, [1.0, 0.0, 2.0]),
        (2, [1.0, 0.0, 2.0]),   # duplicate of 1
        (3, [2.0, 0.0, 4.0]),   # same direction, scaled
        (4, [0.0, 1.0, 0.0]),
        (5, [0.0, 2.0, 0.0]),   # same direction as 4
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in cosine_topk(df, df, k=1).collect()
    }
    got = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in cosine_nn1_arrow(df, df).collect()
    }
    assert ref == got
