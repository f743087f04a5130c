"""decontaminate + sample_token_budget operator tests: overlap semantics,
min_hits threshold, zero-shingle docs, budget-prefix properties, and the
bit-equality of the bucketed two-pass sampler vs the single-window one
(the DuckDB value twins live in mpds_spark/queries.py)."""

import pytest
from pyspark.sql import functions as F

from mpds_spark.operators.sampling import sample_token_budget
from mpds_spark.operators.text import decontaminate

CORPUS = [
    # d1 shares the eval 3-gram "alpha beta gamma"; d2 shares nothing;
    # d3 is too short for any 3-gram; d4 shares two eval 3-grams
    ("d1", "noise alpha beta gamma more noise words here"),
    ("d2", "completely unrelated text with no overlap at all"),
    ("d3", "two words"),
    ("d4", "alpha beta gamma delta overlapping run of eval text"),
]
EVAL = [
    ("e1", "alpha beta gamma delta is the eval benchmark prompt"),
    ("e2", "another held out question"),
]


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    return corpus, ev


def test_decontaminate_flags_overlap(frames):
    corpus, ev = frames
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, ev, n=3).collect()
    }
    assert len(out) == 4
    assert out["d1"]["contaminated"] and out["d1"]["n_hits"] == 1
    assert not out["d2"]["contaminated"] and out["d2"]["n_hits"] == 0
    # too short for any 3-gram: surfaces with zero counts, not dropped
    assert out["d3"]["n_shingles"] == 0 and out["d3"]["hit_frac"] == 0.0
    assert not out["d3"]["contaminated"]
    # d4: "alpha beta gamma" + "beta gamma delta" both occur in e1
    assert out["d4"]["n_hits"] == 2
    assert out["d4"]["hit_frac"] == pytest.approx(
        2 / out["d4"]["n_shingles"]
    )


def test_decontaminate_min_hits(frames):
    corpus, ev = frames
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, ev, n=3, min_hits=2).collect()
    }
    assert out == {"d1": False, "d2": False, "d3": False, "d4": True}


def _doc_table(spark, n=400, groups=5):
    rows = [
        (
            i,
            f"g{i % groups}",
            " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 40)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_budget_respected_and_greedy_prefix(spark):
    docs = _doc_table(spark)
    out = sample_token_budget(docs, budget=300, group="source").toPandas()
    assert (out["cum_tok"] <= 300).all()
    # per-group: kept set is the exact greedy prefix of the hash order
    full = sample_token_budget(docs, budget=10**9, group="source").toPandas()
    for g, grp in full.groupby("source"):
        kept = set(out.loc[out["source"] == g, "doc_id"])
        ordered = grp.sort_values("cum_tok")
        run, expect = 0, set()
        for _, r in ordered.iterrows():
            run += r["n_tok"]
            if run <= 300:
                expect.add(r["doc_id"])
        assert kept == expect, g


def test_bucketed_strategy_bit_equal(spark):
    docs = _doc_table(spark, n=600, groups=4)
    a = (
        sample_token_budget(docs, budget=500, strategy="window")
        .orderBy("doc_id")
        .collect()
    )
    b = (
        sample_token_budget(docs, budget=500, strategy="bucketed")
        .orderBy("doc_id")
        .collect()
    )
    assert a == b
    # and with 256 buckets (2 nibbles)
    c = (
        sample_token_budget(docs, budget=500, strategy="bucketed", nibbles=2)
        .orderBy("doc_id")
        .collect()
    )
    assert a == c


def test_layout_independence(spark):
    docs = _doc_table(spark, n=300, groups=3)
    a = (
        sample_token_budget(docs, budget=400)
        .orderBy("doc_id")
        .collect()
    )
    b = (
        sample_token_budget(docs.repartition(13, "doc_id"), budget=400)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_unknown_strategy_raises(spark):
    docs = _doc_table(spark, n=10, groups=1)
    with pytest.raises(ValueError):
        sample_token_budget(docs, budget=10, strategy="nope")


def test_unigram_logprob_score_hand_computed(spark):
    """Hand-checked add-1 unigram NLL on a 3-doc corpus; the repeated word
    scores lower (more probable) than singletons."""
    import math

    from mpds_spark.operators.text import unigram_logprob_score

    docs = spark.createDataFrame(
        [("a", "x x y"), ("b", "x z"), ("c", "q")], ["doc_id", "text"]
    )
    # counts: x=3, y=1, z=1, q=1 -> N=6, V=4, denom=10
    out = {r["doc_id"]: r for r in unigram_logprob_score(docs).collect()}
    p = {"x": 4 / 10, "y": 2 / 10, "z": 2 / 10, "q": 2 / 10}
    exp_a = -(2 * math.log(p["x"]) + math.log(p["y"])) / 3
    assert out["a"]["unigram_nll"] == pytest.approx(exp_a, rel=1e-12)
    assert out["c"]["unigram_nll"] == pytest.approx(-math.log(p["q"]), rel=1e-12)
    # boilerplate (common words) scores lower than rare-word docs
    assert out["a"]["unigram_nll"] < out["c"]["unigram_nll"]
    assert out["a"]["n_words"] == 3


def test_lm_quality_buckets_terciles(spark):
    """Each group splits ~evenly into head/middle/tail by its OWN score
    distribution, and bucket order tracks score order within a group."""
    from mpds_spark.operators.text import lm_quality_buckets

    # two sources with very different score scales: per-group quantiles
    # must bucket each source against itself
    rows = []
    for i in range(30):
        # monotone mix: more singleton words -> higher NLL
        s0 = " ".join(["common"] * (31 - i) + [f"rare{i}_{j}" for j in range(i + 1)])
        s1 = " ".join(["shared"] * (2 * i + 1) + [f"uniq{i}_{j}" for j in range(30 - i)])
        rows.append((i, "s0", s0))
        rows.append((100 + i, "s1", s1))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    pdf = lm_quality_buckets(docs, group="source").toPandas()
    for g, grp in pdf.groupby("source"):
        counts = grp["bucket"].value_counts()
        assert set(counts.index) == {"head", "middle", "tail"}, g
        assert counts.max() - counts.min() <= 2, (g, counts.to_dict())
        h = grp.loc[grp.bucket == "head", "unigram_nll"].max()
        t = grp.loc[grp.bucket == "tail", "unigram_nll"].min()
        assert h < t, g


def test_pack_sequences_reconstruction_and_parity(spark):
    """Packed bins reconstruct the hash-ordered token stream exactly; all
    bins but the last are full; segment maps tile each row; bucketed
    two-pass is bit-equal to the global window; layout-independent."""
    import hashlib

    from mpds_spark.operators.sampling import pack_sequences

    rows = [(i, list(range(i * 100, i * 100 + 3 + (i * 7) % 11))) for i in range(25)]
    rows.append((99, []))
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    out = pack_sequences(df, 16).orderBy("bin_id").collect()
    stream = [t for r in out for t in r["tokens"]]
    order = sorted(
        (r for r in rows if r[1]),
        key=lambda x: (hashlib.md5(str(x[0]).encode()).hexdigest(), x[0]),
    )
    assert stream == [t for _, toks in order for t in toks]
    assert all(r["n_tok_packed"] == 16 for r in out[:-1])
    for r in out:
        pos = 0
        for s in r["segments"]:
            assert s["off"] == pos
            pos += s["len"]
        assert pos == r["n_tok_packed"] == len(r["tokens"])
    b = pack_sequences(df, 16, strategy="bucketed").orderBy("bin_id").collect()
    assert [r.asDict() for r in b] == [r.asDict() for r in out]
    c = pack_sequences(df.repartition(7), 16).orderBy("bin_id").collect()
    assert [r.asDict() for r in c] == [r.asDict() for r in out]
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_budget_nesting_monotone(spark):
    """Prefix rule => selections nest: kept(budget b1) is a subset of
    kept(b2) for b1 <= b2, per group, and cum_tok values agree on the
    intersection (the selection only ever EXTENDS as budget grows)."""
    docs = _doc_table(spark, n=250, groups=4)
    sels = {
        b: sample_token_budget(docs, budget=b, group="source").toPandas()
        for b in (100, 250, 600)
    }
    for lo, hi in ((100, 250), (250, 600)):
        a, b = sels[lo], sels[hi]
        assert set(a["doc_id"]) <= set(b["doc_id"])
        m = b.set_index("doc_id").loc[a["doc_id"]]
        assert (m["cum_tok"].to_numpy() == a.set_index("doc_id").loc[a["doc_id"], "cum_tok"].to_numpy()).all()


def test_pack_sequences_giant_doc_spans_many_bins(spark):
    """A doc much longer than L is split across consecutive bins with one
    segment per bin, and the stream still reconstructs exactly."""
    import hashlib

    from mpds_spark.operators.sampling import pack_sequences

    rows = [(1, list(range(1000, 1100))), (2, [1, 2, 3]), (3, [7] * 5)]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    out = pack_sequences(df, 16).orderBy("bin_id").collect()
    stream = [t for r in out for t in r["tokens"]]
    order = sorted(
        rows, key=lambda x: (hashlib.md5(str(x[0]).encode()).hexdigest(), x[0])
    )
    assert stream == [t for _, toks in order for t in toks]
    # doc 1 (100 tokens) must appear in ceil-ish consecutive bins with
    # contiguous slices in order
    d1 = [
        (r["bin_id"], s["off"], s["len"])
        for r in out
        for s in r["segments"]
        if s["doc_id"] == 1
    ]
    assert len(d1) >= 7
    assert [b for b, _, _ in d1] == list(range(d1[0][0], d1[0][0] + len(d1)))
    assert sum(ln for _, _, ln in d1) == 100
    # interior bins of the giant doc are single-segment full bins
    for b, off, ln in d1[1:-1]:
        assert off == 0 and ln == 16


def test_budget_dict_per_group_quota(spark):
    """A dict budget is a whitelist + per-group quota: listed groups get
    their own cap (prefix-consistent with the scalar call), absent groups
    are excluded entirely."""
    docs = _doc_table(spark, n=200, groups=4)
    mix = sample_token_budget(
        docs, budget={"g0": 200, "g1": 500}, group="source"
    ).toPandas()
    assert set(mix["source"]) <= {"g0", "g1"}
    for g, cap in (("g0", 200), ("g1", 500)):
        grp = mix[mix.source == g]
        assert (grp["cum_tok"] <= cap).all()
        single = sample_token_budget(docs, budget=cap, group="source").toPandas()
        assert set(grp["doc_id"]) == set(
            single.loc[single.source == g, "doc_id"]
        )


def test_temperature_rebalances_toward_equal(spark):
    """alpha=0.5 narrows the spread between a giant and a small source vs
    natural (alpha=1) proportions; per-group fills are prefix-consistent
    with sample_token_budget; bucketed strategy bit-equal."""
    from mpds_spark.operators.sampling import sample_tokens_temperature

    rows = []
    for i in range(160):  # g_big ~8x g_small token mass
        g = "g_big" if i % 9 else "g_small"
        rows.append((i, g, " ".join(f"w{i}_{j}" for j in range(10))))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = sample_tokens_temperature(docs, total_budget=600, alpha=0.5).toPandas()
    got = out.groupby("source")["n_tok"].sum()
    budgets = out.groupby("source")["budget"].first()
    # sqrt weighting: big/small budget ratio ~ sqrt(8) ~ 2.8, far below 8
    ratio = budgets["g_big"] / budgets["g_small"]
    assert 2 < ratio < 4, ratio
    assert (out["cum_tok"] <= out["budget"]).all()
    # prefix consistency per group against the plain budget op
    for g in ("g_big", "g_small"):
        cap = int(budgets[g])
        single = sample_token_budget(docs, budget=cap, group="source").toPandas()
        assert set(out.loc[out.source == g, "doc_id"]) == set(
            single.loc[single.source == g, "doc_id"]
        )
    b = (
        sample_tokens_temperature(
            docs, total_budget=600, alpha=0.5, strategy="bucketed"
        )
        .orderBy("doc_id")
        .collect()
    )
    a = (
        sample_tokens_temperature(docs, total_budget=600, alpha=0.5)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_budget_auto_strategy_matches(spark):
    """strategy='auto' picks a real strategy and returns the identical
    selection (small fixture routes to 'window')."""
    docs = _doc_table(spark, n=120, groups=3)
    a = sample_token_budget(docs, budget=300, strategy="auto").orderBy("doc_id").collect()
    b = sample_token_budget(docs, budget=300, strategy="window").orderBy("doc_id").collect()
    assert a == b


def test_bucketed_equal_under_hot_group_skew(spark):
    """One group carrying ~90% of all tokens (the case the bucketed
    two-pass exists for): both strategies agree bit-for-bit, and with
    nibbles=2 (256 buckets) too."""
    rows = []
    for i in range(400):
        g = "hot" if i % 10 else f"cold{i % 3}"
        rows.append((i, g, " ".join(f"w{i}_{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    a = sample_token_budget(docs, budget=900, strategy="window").orderBy("doc_id").collect()
    b = sample_token_budget(docs, budget=900, strategy="bucketed").orderBy("doc_id").collect()
    c = sample_token_budget(docs, budget=900, strategy="bucketed", nibbles=2).orderBy("doc_id").collect()
    assert a == b == c
    from mpds_spark.operators.sampling import pack_sequences

    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("tokens")
    )
    pa = pack_sequences(toks, 64, strategy="window").orderBy("bin_id").collect()
    pb = pack_sequences(toks, 64, strategy="bucketed", nibbles=2).orderBy("bin_id").collect()
    assert [r.asDict() for r in pa] == [r.asDict() for r in pb]


def test_hash_split_deterministic_and_proportional(spark):
    """Split assignment is layout-independent, roughly proportional, and
    seed changes redraw it; bad fractions raise."""
    from mpds_spark.operators.sampling import hash_split

    docs = _doc_table(spark, n=1000, groups=2)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, fr).select("doc_id", "split").toPandas()
    b = (
        hash_split(docs.repartition(17), fr)
        .select("doc_id", "split")
        .toPandas()
    )
    assert a.sort_values("doc_id").values.tolist() == b.sort_values("doc_id").values.tolist()
    counts = a["split"].value_counts()
    assert 730 < counts["train"] < 870
    assert 60 < counts["val"] < 140 and 60 < counts["test"] < 140
    c = hash_split(docs, fr, seed="other").select("doc_id", "split").toPandas()
    assert (a.sort_values("doc_id")["split"].values != c.sort_values("doc_id")["split"].values).any()
    with pytest.raises(ValueError):
        hash_split(docs, {"train": 0.5, "val": 0.1})


def test_bucketed_int_group_column(spark):
    """ADVICE r3: the bucketed carry table mirrors the source group
    column's TYPE — an int group key used to break / mis-join against the
    hardcoded `string` carry schema while the window strategy worked
    (the strategies are documented bit-identical)."""
    docs = _doc_table(spark, n=200, groups=3).select(
        "doc_id",
        "text",
        F.substring("source", 2, 5).cast("int").alias("src_id"),
    )
    a = (
        sample_token_budget(docs, budget=300, group="src_id", strategy="window")
        .orderBy("doc_id")
        .collect()
    )
    b = (
        sample_token_budget(
            docs, budget=300, group="src_id", strategy="bucketed"
        )
        .orderBy("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0
    # dict budgets keyed by int group values join on the same typed column
    caps = {0: 100, 1: 50, 2: 10**6}
    d = sample_token_budget(docs, budget=caps, group="src_id").toPandas()
    assert len(d) > 0
    assert all(r.cum_tok <= caps[r.src_id] for r in d.itertuples())


def test_lm_quality_buckets_boundary_strategies_identical(spark):
    """The narrow-plan grouped_agg (exact Percentile) and the at-scale
    bracketed (exact_grouped_quantiles_multi) boundary paths are
    bit-identical per row; auto (which routes small groups to grouped_agg)
    matches both; unknown strategy raises."""
    import pytest as _pytest

    from mpds_spark.operators.text import lm_quality_buckets

    rows = []
    for i in range(25):
        rows.append(
            (i, f"s{i % 2}", " ".join(["w"] * (i + 1) + [f"u{i}_{j}" for j in range(25 - i)]))
        )
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])

    def run(strategy):
        got = (
            lm_quality_buckets(docs, boundaries=strategy)
            .orderBy("doc_id")
            .collect()
        )
        # unigram_nll is an F.avg over doubles: partial-aggregation ORDER
        # is scheduling-dependent, so independent executions jitter at the
        # 1e-16 level (the catalog query rounds to 6 decimals for the
        # oracle hash for exactly this reason) — compare discrete fields
        # exactly and the score to 9 decimals
        return [
            (r["doc_id"], r["source"], r["n_words"], r["bucket"],
             round(r["unigram_nll"], 9))
            for r in got
        ]

    a, b, c = run("grouped_agg"), run("bracketed"), run("auto")
    assert a == b == c and len(a) == 25
    with _pytest.raises(ValueError):
        lm_quality_buckets(docs, boundaries="nope")


def test_redact_pii_counts_and_replacement(spark):
    """Planted PII row: per-kind counts on the original text, sequential
    redaction (emails first, so their dots don't feed the IP pattern),
    non-PII text untouched."""
    from mpds_spark.operators.text import redact_pii

    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and d@e.io call 415-555-1234 "
            "or 415.555.9999 ip 10.0.0.1 done"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_phone"], r1["n_ipv4"]) == (2, 2, 1)
    assert r1["text_redacted"] == (
        "mail <EMAIL> and <EMAIL> call <PHONE> or <PHONE> ip <IPV4> done"
    )
    r2 = out[2]
    assert (r2["n_email"], r2["n_phone"], r2["n_ipv4"]) == (0, 0, 0)
    assert r2["text_redacted"] == "no pii here at all"


def test_dsir_logratio_hand_computed(spark):
    """Tiny corpus vs target: per-doc log-weight equals the add-1-smoothed
    unigram log-ratio computed by hand."""
    import math

    from mpds_spark.operators.text import dsir_logratio

    corpus = [(1, "a a b"), (2, "b c")]
    target = [(10, "a a a b")]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    tg = spark.createDataFrame(target, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dsir_logratio(df, tg).collect()}
    # source counts: a=2 b=2 c=1 (ns=5); target: a=3 b=1 (nt=4); V={a,b,c}=3
    ns, nt, v = 5, 4, 3
    lr = {
        w: math.log((ct + 1) / (nt + v)) - math.log((cs + 1) / (ns + v))
        for w, cs, ct in [("a", 2, 3), ("b", 2, 1), ("c", 1, 0)]
    }
    exp1 = lr["a"] * 2 + lr["b"]
    exp2 = lr["b"] + lr["c"]
    assert abs(out[1]["dsir_logweight"] - exp1) < 1e-12
    assert abs(out[2]["dsir_logweight"] - exp2) < 1e-12
    assert abs(out[2]["dsir_logweight_mean"] - exp2 / 2) < 1e-12
    assert out[1]["n_words"] == 3
    # target-like doc 1 (a-heavy) outweighs doc 2
    assert out[1]["dsir_logweight_mean"] > out[2]["dsir_logweight_mean"]


def test_stratified_sample_deterministic_and_whitelist(spark):
    """Same kept set under any layout; dict fractions whitelist groups;
    scalar fraction applies to every group; rates land near the target."""
    from mpds_spark.operators.sampling import stratified_sample

    docs = _doc_table(spark, n=600, groups=3)
    a = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, 0.5, group="source").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(17, "doc_id"), 0.5, group="source"
        ).collect()
    )
    assert a == b and 200 < len(a) < 400
    kept = stratified_sample(
        docs, {"g0": 1.0, "g1": 0.3}, group="source"
    ).toPandas()
    assert set(kept["source"]) == {"g0", "g1"}  # g2 absent -> dropped
    assert (kept["source"] == "g0").sum() == 200  # frac 1.0 keeps all
    n1 = (kept["source"] == "g1").sum()
    assert 30 <= n1 <= 90  # ~0.3 * 200


def test_importance_resample_gumbel_properties(spark):
    """Gumbel top-k resampling: deterministic per seed, different across
    seeds, and selection frequency tracks the weights (high-weight items
    dominate the sample across independent seeds)."""
    from mpds_spark.operators.sampling import importance_resample

    rows = [(i, 3.0 if i < 20 else -3.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lw"])
    a = [r["doc_id"] for r in importance_resample(df, "lw", 30, seed="s1").collect()]
    b = [r["doc_id"] for r in importance_resample(df, "lw", 30, seed="s1").collect()]
    c = [r["doc_id"] for r in importance_resample(df, "lw", 30, seed="s2").collect()]
    assert a == b and set(a) != set(c)
    # e^3 vs e^-3 odds (~400:1): the 20 heavy items should essentially
    # always be selected, across both seeds
    heavy = set(range(20))
    assert len(heavy & set(a)) == 20
    assert len(heavy & set(c)) == 20


def test_winnow_fingerprints_matches_reference_impl(spark):
    """Winnowing (Schleimer et al. 2003): Spark output equals a literal
    pure-Python winnow (min hash per window, rightmost tie-break, full
    windows, deduped), and two docs sharing a >= w+n-1-word substring
    share at least one fingerprint."""
    import hashlib

    from mpds_spark.operators.text import winnow_fingerprints

    def py_winnow(words, n=3, w=4):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        if not hs:
            return set()
        out = set()
        starts = range(max(len(hs) - w, 0) + 1)
        for p in starts:
            win = hs[p : p + w]
            m = min(win)
            # rightmost occurrence of the min in this window
            ri = max(i for i, h in enumerate(win) if h == m)
            out.add((p + ri, m))
        return out

    shared = "the quick brown fox jumps over the lazy dog".split()
    docs = {
        1: ("alpha beta gamma " + " ".join(shared) + " end token").split(),
        2: ("start words here " + " ".join(shared) + " tail piece").split(),
        3: "completely different content with no overlap at all okay".split(),
        4: "tiny doc".split(),  # shorter than n -> no grams, no rows
    }
    df = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in docs.items()], ["doc_id", "text"]
    )
    got = winnow_fingerprints(df, n=3, w=4).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    for k, words in docs.items():
        exp = py_winnow(words, 3, 4)
        assert by_doc.get(k, set()) == exp, k
    # guarantee: docs 1 and 2 share the 9-word run (>= w+n-1 = 6) -> at
    # least one common fingerprint HASH; doc 3 shares none with either
    f1 = {h for _, h in by_doc[1]}
    f2 = {h for _, h in by_doc[2]}
    f3 = {h for _, h in by_doc[3]}
    assert f1 & f2
    assert not (f1 & f3) and not (f2 & f3)


def test_ngram_novelty_small(spark):
    """First doc's n-grams are all novel; an exact duplicate later has
    novelty 0; a doc sharing one of two bigrams has novelty 0.5."""
    from pyspark.sql import functions as F

    from mpds_spark.operators.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (0, "a b c"),      # bigrams {a b, b c} both novel
            (1, "a b c"),      # exact dup -> 0 novel
            (2, "b c d e"),    # {b c, c d, d e}: b c seen -> 2/3
            (3, "x"),          # too short: excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(df, n=2).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["n_novel"] == 2 and out[0]["novelty"] == 1.0
    assert out[1]["n_novel"] == 0 and out[1]["novelty"] == 0.0
    assert out[2]["n_ngrams"] == 3 and out[2]["n_novel"] == 2


def test_ngram_novelty_matches_bruteforce(spark):
    """Differential: novelty from the distributed min-owner aggregation
    equals a brute-force python recomputation over a random corpus."""
    import numpy as np

    from mpds_spark.operators.text import ngram_novelty

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 25)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_novel"])
        for r in ngram_novelty(df, n=2).collect()
    }
    seen: set = set()
    for i, t in enumerate(texts):
        ws = t.split()
        grams = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
        novel = grams - seen
        seen |= grams
        assert got[i] == (len(grams), len(novel)), i


def test_suffix_prefix_overlap_matches_bruteforce(spark):
    """Differential: the JVM higher-order overlap equals a brute-force
    python suffix/prefix scan for every consecutive pair."""
    import numpy as np

    from mpds_spark.operators.pairs import suffix_prefix_overlap

    rng = np.random.default_rng(4)
    vocab = ["a", "b", "c"]  # tiny vocab -> frequent nontrivial overlaps
    rows = [
        ("s", i, [str(w) for w in rng.choice(vocab, size=rng.integers(1, 12))])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, tokens array<string>")
    out = {
        r["doc_id"]: r["overlap"]
        for r in suffix_prefix_overlap(
            df, tokens="tokens", part="source", order_cols=["doc_id"], max_k=5
        ).collect()
    }

    def brute(a, b, mk=5):
        best = 0
        for k in range(1, min(mk, len(a), len(b)) + 1):
            if a[-k:] == b[:k]:
                best = k
        return best

    for i in range(59):
        assert out[i] == brute(rows[i][2], rows[i + 1][2]), i


def test_bigram_nll_matches_bruteforce(spark):
    """Differential: distributed add-1 bigram NLL equals a brute-force
    python recomputation (counts, context counts, vocab, mean -ln p)."""
    import math

    import numpy as np

    from mpds_spark.operators.text import bigram_logprob_score

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 20)))
        for _ in range(50)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_nll"])
        for r in bigram_logprob_score(df).collect()
    }
    c12: dict = {}
    allw: set = set()
    for t in texts:
        ws = t.split()
        allw |= set(ws)
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict = {}
    for (a, _), c in c12.items():
        c1[a] = c1.get(a, 0) + c
    V = len(allw)
    for i, t in enumerate(texts):
        ws = t.split()
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            assert i not in got
            continue
        nll = -sum(
            math.log((c12[p] + 1.0) / (c1[p[0]] + 1.0 * V)) for p in bgs
        ) / len(bgs)
        n, g = got[i]
        assert n == len(bgs)
        assert abs(g - nll) < 1e-9, i


def test_tfidf_top_terms_matches_bruteforce(spark):
    import math
    from collections import Counter

    import numpy as np

    from mpds_spark.operators.text import tfidf_top_terms

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (f"s{i % 3}", i, " ".join(rng.choice(vocab, size=rng.integers(3, 15))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r["source"], r["rank"]): (r["term"], r["tf"], r["df"], r["tfidf"])
        for r in tfidf_top_terms(df, k=4).collect()
    }
    tf: Counter = Counter()
    docw = set()
    for s, i, t in rows:
        for w in t.split():
            tf[(s, w)] += 1
            docw.add((i, w))
    dfc: Counter = Counter(w for _, w in docw)
    n_docs = len(rows)
    for s in ("s0", "s1", "s2"):
        scored = sorted(
            (
                (
                    -tf[(s, w)] * (math.log((1 + n_docs) / (1 + dfc[w])) + 1),
                    w,
                )
                for (ss, w) in tf
                if ss == s
            ),
        )[:4]
        for rk, (negsc, w) in enumerate(scored, start=1):
            term, tfx, dfx, sc = got[(s, rk)]
            assert term == w, (s, rk)
            assert tfx == tf[(s, w)] and dfx == dfc[w]
            assert abs(sc - (-negsc)) < 1e-9


def test_cross_group_ngram_overlap_matches_bruteforce(spark):
    import numpy as np

    from mpds_spark.operators.text import cross_group_ngram_overlap

    rng = np.random.default_rng(13)
    vocab = ["a", "b", "c", "d"]
    rows = [
        (f"g{i % 3}", i, " ".join(rng.choice(vocab, size=rng.integers(2, 18))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r["g1"], r["g2"]): (r["shared"], r["n1"], r["n2"])
        for r in cross_group_ngram_overlap(df, group="source", n=3).collect()
    }
    sets: dict = {}
    for s, _, t in rows:
        ws = t.split()
        sets.setdefault(s, set()).update(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
    gs = sorted(sets)
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            inter = len(sets[gs[i]] & sets[gs[j]])
            if inter == 0:
                assert (gs[i], gs[j]) not in got
                continue
            assert got[(gs[i], gs[j])] == (
                inter,
                len(sets[gs[i]]),
                len(sets[gs[j]]),
            )


def test_remove_boilerplate_segments_planted(spark):
    """Planted nav-bar: the same 5-word segment opens three docs of one
    source — it must vanish from all three (including the first); the
    same text in a DIFFERENT source stays; a fully-boilerplate doc
    reports n_words_clean=0 and empty text_clean."""
    from mpds_spark.operators.text import remove_boilerplate_segments

    nav = "home about contact privacy terms"
    rows = [
        (0, "s1", nav + " alpha beta gamma delta eps"),
        (1, "s1", nav + " zeta eta theta iota kappa"),
        (2, "s1", nav),  # nothing but the nav bar
        (3, "s1", "unique words only in this doc"),
        (4, "s2", nav + " other source one occurrence"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_boilerplate_segments(df, seg_words=5, min_docs=2).collect()
    }
    assert out[0]["n_seg"] == 2 and out[0]["n_removed"] == 1
    assert out[0]["text_clean"] == "alpha beta gamma delta eps"
    assert out[1]["text_clean"] == "zeta eta theta iota kappa"
    assert out[2] == {
        "doc_id": 2, "n_seg": 1, "n_removed": 1,
        "n_words_clean": 0, "text_clean": "",
    }
    assert out[3]["n_removed"] == 0 and out[3]["n_words_clean"] == 6
    # one occurrence within s2 -> below min_docs there, kept
    assert out[4]["n_removed"] == 0
    assert out[4]["text_clean"].startswith(nav)
    assert all(out[d]["n_words_clean"] == len(out[d]["text_clean"].split())
               for d in out if out[d]["text_clean"])


def test_classifier_quality_score_differential(spark):
    """Pure-Python md5 re-derivation of the frozen hashed weights must
    match the JVM expression exactly (hash path, integer sum, score and
    fast-sigmoid squash)."""
    import hashlib

    from mpds_spark.operators.text import classifier_quality_score

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "spark shuffles are expensive broadcast when small"),
        (2, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in classifier_quality_score(df, n_buckets=4096).collect()}
    for doc_id, text in rows:
        words = text.split()
        sw = sum(
            (int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 4096) % 1001
            - 500
            for w in words
        )
        s0 = sw / (500.0 * len(words))
        g = got[doc_id]
        assert g["n_words"] == len(words) and g["sum_w"] == sw
        assert abs(g["score"] - s0) < 1e-12
        assert abs(g["prob"] - (0.5 + 0.5 * s0 / (1.0 + abs(s0)))) < 1e-12
        assert g["label"] == (sw >= 0)


def test_zipf_fit_matches_numpy_lstsq(spark):
    """Slope/intercept agree with numpy least squares on a planted
    Zipf-ish corpus; a flat (uniform-frequency) source yields slope ~0."""
    import numpy as np

    from mpds_spark.operators.text import zipf_fit

    rows = []
    # source z: word_i appears ~ 200/i times -> slope near -1
    toks = []
    for i in range(1, 21):
        toks += [f"w{i:02d}"] * max(200 // i, 1)
    rows.append((0, "z", " ".join(toks)))
    # source u: every word exactly 7 times -> ln(c) constant, slope 0
    toks = []
    for i in range(20):
        toks += [f"u{i:02d}"] * 7
    rows.append((1, "u", " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r.asDict() for r in zipf_fit(df, top_v=64).collect()}

    # numpy re-derivation for source z
    counts = sorted(
        [max(200 // i, 1) for i in range(1, 21)], reverse=True
    )
    x = np.log(np.arange(1, 21, dtype=float))
    y = np.log(np.array(counts, dtype=float))
    A = np.vstack([x, np.ones_like(x)]).T
    slope, intercept = np.linalg.lstsq(A, y, rcond=None)[0]
    assert got["z"]["n_vocab"] == 20
    assert got["z"]["zipf_slope"] == pytest.approx(slope, abs=1e-9)
    assert got["z"]["zipf_intercept"] == pytest.approx(intercept, abs=1e-9)
    assert got["u"]["zipf_slope"] == pytest.approx(0.0, abs=1e-12)


def test_heaps_fit_matches_numpy_lstsq(spark):
    """Beta / ln K agree with a brute-force Python rederivation (cumsum +
    power-of-two sampling + numpy lstsq) on a deterministic multi-source
    corpus; a vocabulary-saturating source fits a smaller beta than one
    that keeps introducing new words."""
    import numpy as np

    from mpds_spark.operators.text import heaps_fit

    rng = np.random.default_rng(7)
    rows, expect = [], {}
    for src, n_docs, mode in (("grow", 37, "new"), ("sat", 29, "loop")):
        docs = []
        for i in range(n_docs):
            if mode == "new":
                # fresh words keep arriving: V grows ~ N^beta, beta high
                words = [f"{src}_w{rng.integers(0, 40 + 25 * i)}" for _ in range(30)]
            else:
                # closed 30-word vocab: V saturates
                words = [f"{src}_w{rng.integers(0, 30)}" for _ in range(30)]
            docs.append(words)
            rows.append((len(rows), src, " ".join(words)))
        # brute force: cum tokens / cum distinct at ranks 1,2,4,...,n
        seen, pts, cum_n = set(), [], 0
        for r, words in enumerate(docs, start=1):
            cum_n += len(words)
            seen |= set(words)
            if (r & (r - 1)) == 0 or r == n_docs:
                pts.append((cum_n, len(seen)))
        x = np.log(np.array([p[0] for p in pts], dtype=float))
        y = np.log(np.array([p[1] for p in pts], dtype=float))
        A = np.vstack([x, np.ones_like(x)]).T
        beta, lnk = np.linalg.lstsq(A, y, rcond=None)[0]
        expect[src] = (n_docs, len(pts), beta, lnk)

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r.asDict() for r in heaps_fit(df).collect()}
    for src, (n_docs, n_pts, beta, lnk) in expect.items():
        g = got[src]
        assert g["n_docs"] == n_docs and g["n_points"] == n_pts
        assert g["heaps_beta"] == pytest.approx(beta, abs=1e-9)
        assert g["heaps_ln_k"] == pytest.approx(lnk, abs=1e-9)
    assert got["grow"]["heaps_beta"] > got["sat"]["heaps_beta"]


def test_term_burstiness_brute_force(spark):
    """cf/df/burstiness/VMR agree with a collections.Counter rederivation;
    a once-per-doc function word scores burstiness 1 / VMR 0 while a
    clumped content word scores both high."""
    from collections import Counter

    import numpy as np

    from mpds_spark.operators.text import term_burstiness

    rng = np.random.default_rng(11)
    docs = []
    for i in range(40):
        words = ["the"]  # function word: once per doc
        words += [f"w{rng.integers(0, 25)}" for _ in range(int(rng.integers(3, 12)))]
        if i % 13 == 0:
            # clumped content word with VARYING per-doc counts (3,6,9,12)
            # so the within-containing-doc variance exceeds the mean
            words += ["burst"] * (3 + 3 * (i // 13))
        docs.append(words)
    rows = [(i, "s", " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["word"]: r.asDict() for r in term_burstiness(df, top_v=1000).collect()}

    per_word = {}
    for ws in docs:
        for w, c in Counter(ws).items():
            per_word.setdefault(w, []).append(c)
    for w, cs in per_word.items():
        cf, d = sum(cs), len(cs)
        g = got[w]
        assert (g["cf"], g["df"]) == (cf, d)
        assert g["burstiness"] == pytest.approx(cf / d, abs=1e-12)
        if d >= 2:
            var = np.var(np.array(cs, dtype=float), ddof=1)
            assert g["vmr"] == pytest.approx(var / (cf / d), abs=1e-9)
        else:
            assert g["vmr"] is None
    assert got["the"]["burstiness"] == 1.0 and got["the"]["vmr"] == 0.0
    assert got["burst"]["burstiness"] == 7.5 and got["burst"]["vmr"] > 1.0


def test_token_entropy_matches_counter(spark):
    """Per-doc Shannon entropy vs a collections.Counter brute force,
    including the degenerate single-type and repeated-token cases."""
    import math
    from collections import Counter

    from mpds_spark.operators.text import token_entropy

    docs = [
        (1, "a b c d"),               # uniform: H = ln(4)
        (2, "a a a a"),               # single type: H = 0
        (3, "a a b"),                 # mixed
        (4, "x"),                     # one token
        (5, "the the the cat cat sat on on on on"),
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in token_entropy(sdf, text="text", key="doc_id").collect()
    }
    for doc_id, text in docs:
        ws = text.split()
        c = Counter(ws)
        n = len(ws)
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        r = got[doc_id]
        assert r["n_tok"] == n
        assert r["n_types"] == len(c)
        assert abs(r["entropy"] - h) < 1e-12, (doc_id, r["entropy"], h)
        want_norm = h / math.log(len(c)) if len(c) > 1 else 0.0
        assert abs(r["norm_entropy"] - want_norm) < 1e-12
        assert abs(r["ttr"] - len(c) / n) < 1e-12


def test_bm25_scores_matches_bruteforce(spark):
    """BM25 with an explicit term set vs a pure-Python reference over
    Counter term frequencies (Robertson idf, k1/b normalization)."""
    import math
    from collections import Counter

    from mpds_spark.operators.text import bm25_scores

    docs = [
        (1, "cat dog cat fish"),
        (2, "dog dog dog"),
        (3, "fish bird"),
        (4, "tree stone river"),
        (5, "cat cat cat cat dog fish bird bird"),
    ]
    k1, b = 1.2, 0.75
    terms = ["cat", "dog", "bird"]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in bm25_scores(
            sdf, text="text", key="doc_id", terms=terms, k1=k1, b=b
        ).collect()
    }
    n_docs = len(docs)
    lens = {d: len(t.split()) for d, t in docs}
    avgdl = sum(lens.values()) / n_docs
    dfreq = {
        t: sum(1 for _, txt in docs if t in txt.split()) for t in terms
    }
    expected_rows = 0
    for doc_id, text in docs:
        c = Counter(text.split())
        score, hits = 0.0, 0
        for t in sorted(terms):
            tf = c.get(t, 0)
            idf = math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            norm = 1 - b + b * lens[doc_id] / avgdl
            score += idf * (tf * (k1 + 1) / (tf + k1 * norm))
            hits += tf > 0
        if hits == 0:
            assert doc_id not in got  # doc 4 matches nothing
            continue
        expected_rows += 1
        r = got[doc_id]
        assert r["n_match"] == hits
        assert abs(r["bm25"] - score) < 1e-12, (doc_id, r["bm25"], score)
    assert len(got) == expected_rows


def test_phrase_search_bruteforce(spark):
    """Index-join phrase hits must equal direct adjacent-pair scans,
    including overlapping repeats; docs without the phrase are absent."""
    import pandas as pd

    from mpds_spark.operators.text import phrase_search

    docs = [
        (0, "fast table fast table slow"),       # 2 occurrences
        (1, "a fast table"),                     # 1, at pos 2
        (2, "fast slow table fast"),             # 0
        (3, "table fast"),                       # 0 (reversed)
        (4, "fast fast table"),                  # 1, at pos 2
        (5, "nothing here"),                     # 0
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_search(
            spark.createDataFrame(pdf), w1="fast", w2="table"
        ).collect()
    }
    want = {}
    for d, t in docs:
        ws = t.split(" ")
        pos = [
            i + 1
            for i in range(len(ws) - 1)
            if ws[i] == "fast" and ws[i + 1] == "table"
        ]
        if pos:
            want[d] = (len(pos), pos[0])
    assert got == want
    assert got[0] == (2, 1) and got[4] == (1, 2)


def test_log_odds_words_matches_direct(spark):
    """Monroe et al. weighted log-odds z-scores vs the direct formula;
    a word heavily overrepresented in A must rank first."""
    import math

    import pandas as pd

    docs = (
        [("a", "alpha alpha alpha beta common common")] * 5
        + [("a", "alpha gamma common")] * 3
        + [("b", "delta delta beta common common")] * 5
        + [("b", "delta epsilon common")] * 3
    )
    pdf = pd.DataFrame(docs, columns=["source", "text"])
    from mpds_spark.operators.text import log_odds_words

    got = log_odds_words(
        spark.createDataFrame(pdf), group_a="a", group_b="b",
        group="source", text="text", alpha0=10.0, k=10,
    ).collect()

    ca, cb = {}, {}
    for s, t in docs:
        d = ca if s == "a" else cb
        for w in t.split(" "):
            d[w] = d.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    ptot = na + nb
    a0 = 10.0
    want = {}
    for w in set(ca) | set(cb):
        ya, yb = ca.get(w, 0), cb.get(w, 0)
        aw = a0 * (ya + yb) / ptot
        delta = math.log((ya + aw) / (na + a0 - ya - aw)) - math.log(
            (yb + aw) / (nb + a0 - yb - aw)
        )
        z = delta / math.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw))
        want[w] = (ya, yb, delta, z)
    ranked = sorted(
        want.items(), key=lambda kv: (-round(kv[1][3], 6), kv[0])
    )[:10]
    assert [r["word"] for r in got] == [w for w, _ in ranked]
    for r in got:
        ya, yb, delta, z = want[r["word"]]
        assert (r["y_a"], r["y_b"]) == (ya, yb)
        assert abs(r["delta"] - delta) < 1e-9
        assert abs(r["z"] - z) < 1e-9
    assert got[0]["word"] == "alpha"


def test_good_turing_matches_counter(spark):
    """good_turing's (r, N_r, r*) table vs exact Counter enumeration,
    including the NULL r* at the top frequency and the mass shares."""
    from collections import Counter

    import pandas as pd

    from mpds_spark.operators.text import good_turing

    docs = [
        "a a a a b b b c c d",   # a:4 b:3 c:2 d:1
        "e f g h b",             # singles + one more b -> b:4
        "",                      # empty doc drops out
    ]
    pdf = pd.DataFrame({"text": docs})
    got = {r["r"]: r for r in good_turing(
        spark.createDataFrame(pdf), text="text"
    ).collect()}

    f = Counter(w for d in docs for w in d.split() if w)
    nr = Counter(f.values())
    total = sum(r * n for r, n in nr.items())
    assert set(got) == set(nr)
    for r, n in nr.items():
        row = got[r]
        assert row["n_r"] == n
        nxt = nr.get(r + 1)
        if nxt is None:
            assert row["r_star"] is None
        else:
            assert abs(row["r_star"] - (r + 1) * nxt / n) < 1e-12
        assert abs(row["mass_pct"] - 100.0 * r * n / total) < 1e-12


def test_pmi_pairs_bruteforce(spark):
    """pmi_pairs' offset-explode equi-join + exact-integer PMI vs naive
    enumeration of all position pairs within the window."""
    import math
    from collections import Counter

    import pandas as pd

    from mpds_spark.operators.text import pmi_pairs

    docs = [
        "x y x y x y x y",        # tight x/y collocation
        "a b c a b c a b c",
        "x q q q y",              # x..y at distance 4 (outside window 3)
        "a a a a",                # identical-word pairs excluded
    ]
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    got = [
        (r["word_a"], r["word_b"], r["c_pair"], r["pmi"])
        for r in pmi_pairs(
            spark.createDataFrame(pdf), window=3, min_pair=2, k=100
        ).collect()
    ]

    toks = [[w for w in d.split(" ") if w] for d in docs]
    marg = Counter(w for t in toks for w in t)
    N = sum(marg.values())
    pairs = Counter()
    for t in toks:
        for i, wa in enumerate(t):
            for j in range(i + 1, min(i + 4, len(t))):
                if t[j] != wa:
                    pairs[tuple(sorted((wa, t[j])))] += 1
    T = sum(pairs.values())
    want = []
    for (a, b), c in pairs.items():
        if c >= 2:
            pmi = math.log((c * N * N) / (T * marg[a] * marg[b]))
            pmi = math.copysign(
                math.floor(abs(pmi) * 1e6 + 0.5), pmi
            ) / 1e6
            want.append((a, b, c, pmi))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want
    # the planted collocation is present with positive PMI; the
    # distance-4 x..y occurrence contributed nothing (window=3)
    xy = [r for r in got if r[:2] == ("x", "y")]
    assert xy and xy[0][3] > 0 and xy[0][2] == 12
