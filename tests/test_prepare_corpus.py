"""prepare_corpus pipeline: quality -> dedup -> decontamination -> token
budget as one resumable run. Funnel must drop the planted low-quality /
duplicate / contaminated docs at the right stage, and killing after stage
k then resuming must yield a byte-identical final selection re-running no
completed stage."""

import numpy as np
import pandas as pd
import pytest

from mpds_spark.pipelines.prepare_corpus import prepare_corpus


def _corpus(seed=9):
    rng = np.random.default_rng(seed)
    vocab = [f"word{i}" for i in range(100)]
    rows, bases = [], []
    did = 0
    for b in range(24):
        # 'of the' prefix keeps every base doc past the >=2-distinct-
        # stopwords and mean-word-length Gopher rules deterministically
        base = "of the " + " ".join(rng.choice(vocab, size=10))
        src = f"s{b % 3}"
        bases.append(base)
        rows.append((did, base, src)); did += 1
        if b % 4 == 0:  # exact duplicate
            rows.append((did, base, src)); did += 1
        if b % 6 == 0:  # low quality: too short (min_words=8)
            rows.append((did, "tiny doc", src)); did += 1
    # contaminated docs: fresh content (NOT near-dups of any base doc, so
    # they survive dedup) carrying the eval 3-gram verbatim
    for i in range(4):
        fresh = " ".join(rng.choice(vocab, size=10))
        rows.append((did, f"alpha beta gamma of the {fresh}", f"s{i % 3}"))
        did += 1
    return pd.DataFrame(rows, columns=["doc_id", "text", "source"])


EVAL = [(0, "alpha beta gamma delta eval prompt")]


def test_prepare_corpus_funnel_and_resume(spark, tmp_path):
    docs = spark.createDataFrame(_corpus())
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    out1 = str(tmp_path / "full")

    res = prepare_corpus(
        spark, docs, ev, out1, budget=10**6, min_words=8,
        decontam_n=3, dedup_threshold=0.5,
    )
    f = res["funnel"]
    n_in = f["00_input"]
    # stage drops: 4 short docs fail quality; exact dups collapse in dedup;
    # the 4 contaminated docs are dropped at decontam; budget=1e6 keeps all
    assert f["01_quality"] == n_in - 4
    assert f["02_dedup"] < f["01_quality"]  # planted exact dups collapsed
    assert f["03_decontam"] == f["02_dedup"] - 4
    assert f["04_budget"] == f["03_decontam"]  # budget large enough
    sel1 = sorted(r["doc_id"] for r in res["selected"].collect())
    assert len(sel1) == f["04_budget"]

    # kill after stage 2, then resume in a FRESH out_dir ... same dir:
    out2 = str(tmp_path / "resumed")
    part = prepare_corpus(
        spark, docs, ev, out2, budget=10**6, min_words=8,
        decontam_n=3, dedup_threshold=0.5, stop_after=2,
    )
    assert part["selected"] is None and "03_decontam" not in part["funnel"]
    res2 = prepare_corpus(
        spark, docs, ev, out2, budget=10**6, min_words=8,
        decontam_n=3, dedup_threshold=0.5,
    )
    # completed stages were read back, not recomputed
    assert res2["stages"]["01_quality"] == "skipped"
    sel2 = sorted(r["doc_id"] for r in res2["selected"].collect())
    assert sel2 == sel1  # byte-identical final selection


def test_prepare_corpus_budget_caps_per_source(spark, tmp_path):
    docs = spark.createDataFrame(_corpus())
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    res = prepare_corpus(
        spark, docs, ev, str(tmp_path / "b"), budget=40, min_words=8,
    )
    pdf = res["selected"].toPandas()
    assert (pdf["cum_tok"] <= 40).all()
    assert set(pdf["source"]) <= {"s0", "s1", "s2"}
    # every source hits close to its budget (docs are ~10 tokens)
    got = pdf.groupby("source")["n_tok"].sum()
    assert (got > 20).all()


def test_prepare_corpus_pack_stage(spark, tmp_path):
    """pack_length adds the 05_pack stage: full training rows whose token
    total equals the selected docs' token total."""
    docs = spark.createDataFrame(_corpus())
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    res = prepare_corpus(
        spark, docs, ev, str(tmp_path / "p"), budget=10**6, min_words=8,
        pack_length=16,
    )
    assert "05_pack" in res["funnel"] and res["packed"] is not None
    pdf = res["packed"].toPandas()
    sel_tok = res["selected"].toPandas()["n_tok"].sum()
    assert pdf["n_tok_packed"].sum() == sel_tok
    assert (pdf["n_tok_packed"].sort_values().iloc[:-1] == 16).all()


def test_prepare_corpus_full_rerun_skips_everything(spark, tmp_path):
    """A second run over identical input+spec (incl. 05_pack) reads every
    stage back — nothing recomputes — and returns identical packed rows."""
    docs = spark.createDataFrame(_corpus())
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    out = str(tmp_path / "rr")
    kw = dict(budget=10**6, min_words=8, pack_length=16)
    r1 = prepare_corpus(spark, docs, ev, out, **kw)
    r2 = prepare_corpus(spark, docs, ev, out, **kw)
    assert r2["stages"]["01_quality"] == "skipped"
    assert r2["stages"]["03_decontam"] == "skipped"
    assert r2["stages"]["04_budget"] == "skipped"
    assert r2["stages"]["05_pack"] == "skipped"
    a = r1["packed"].orderBy("bin_id").collect()
    b = r2["packed"].orderBy("bin_id").collect()
    assert a == b and r1["funnel"] == r2["funnel"]


def test_prepare_corpus_shard_export(spark, tmp_path):
    """shard_rows adds the 06_shards export; rerun skips it; shard totals
    equal the packed row count."""
    docs = spark.createDataFrame(_corpus())
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    out = str(tmp_path / "sh")
    kw = dict(budget=10**6, min_words=8, pack_length=16, shard_rows=5)
    r1 = prepare_corpus(spark, docs, ev, out, **kw)
    assert r1["stages"]["06_shards"] == "ran"
    assert r1["shards"]["total_rows"] == r1["funnel"]["05_pack"]
    assert all(s["rows"] <= 5 for s in r1["shards"]["shards"])
    r2 = prepare_corpus(spark, docs, ev, out, **kw)
    assert r2["stages"]["06_shards"] == "skipped"
    assert r2["shards"] == r1["shards"]


def test_prepare_corpus_temperature_split_resume(spark, tmp_path):
    """VERDICT r3 ask #5: temperature-rebalanced budget + hash split wired
    into the pipeline — per-split pack/shard stages, funnel rows for each,
    and the same kill/resume byte-identity guarantee through the new
    stages."""
    docs = spark.createDataFrame(_corpus())
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    kw = dict(
        budget=150,
        min_words=8,
        temperature_alpha=0.5,
        split_fractions={"train": 0.7, "val": 0.3},
        pack_length=16,
        shard_rows=5,
    )
    out = str(tmp_path / "ts")
    r1 = prepare_corpus(spark, docs, ev, out, **kw)
    f = r1["funnel"]
    # the split partitions the selection exactly
    assert f["05_split/train"] + f["05_split/val"] == f["04_budget"]
    # temperature path: per-group quota column present, quotas respected
    sel = r1["selected"].toPandas()
    assert "budget" in sel.columns
    assert (sel["cum_tok"] <= sel["budget"]).all()
    # per-split packed token totals == that split's selected token total;
    # no packed row mixes splits (packing ran per split by construction)
    spl = r1["splits"].toPandas()
    merged = sel.merge(spl, on="doc_id")
    for sname in ("train", "val"):
        toks = merged.loc[merged["split"] == sname, "n_tok"].sum()
        assert (
            r1["packed"][sname].toPandas()["n_tok_packed"].sum() == toks
        ), sname
        assert r1["shards"][sname]["total_rows"] == f[f"06_pack/{sname}"]

    # kill after the split stage, resume in a fresh dir -> byte-identical
    # per-split packed rows, completed stages read back
    out2 = str(tmp_path / "ts2")
    part = prepare_corpus(spark, docs, ev, out2, **{**kw, "stop_after": 5})
    assert "06_pack/train" not in part["funnel"]
    r2 = prepare_corpus(spark, docs, ev, out2, **kw)
    assert r2["stages"]["05_split"] == "skipped"
    assert r2["stages"]["06_pack/train"] == "ran"
    for sname in ("train", "val"):
        a = r1["packed"][sname].orderBy("bin_id").collect()
        b = r2["packed"][sname].orderBy("bin_id").collect()
        assert a == b, sname
    assert r2["funnel"] == r1["funnel"]


def test_prepare_corpus_redact_stage(spark, tmp_path):
    """redact_patterns adds stage 00_redact: planted emails are scrubbed
    before every downstream stage (quality/dedup/budget see redacted
    text), and a rerun skips the stage."""
    from mpds_spark.operators.text import PII_PATTERNS

    pdf = _corpus()
    pdf.loc[pdf.index[:5], "text"] = (
        pdf["text"].iloc[:5] + " mail bob@example.com"
    )
    docs = spark.createDataFrame(pdf)
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    out = str(tmp_path / "red")
    kw = dict(budget=10**6, min_words=8, redact_patterns=dict(PII_PATTERNS))
    r1 = prepare_corpus(spark, docs, ev, out, **kw)
    assert r1["stages"]["00_redact"] == "ran"
    assert r1["funnel"]["00_redact"] == r1["funnel"]["00_input"]
    # the materialized redacted stage holds no raw emails
    red = spark.read.parquet(f"{out}/00_redact/data").toPandas()
    assert not red["text"].str.contains("@").any()
    assert red["text"].str.contains("<EMAIL>").sum() == 5
    r2 = prepare_corpus(spark, docs, ev, out, **kw)
    assert r2["stages"]["00_redact"] == "skipped"
    assert sorted(r.doc_id for r in r2["selected"].collect()) == sorted(
        r.doc_id for r in r1["selected"].collect()
    )


def test_prepare_corpus_boilerplate_stage(spark, tmp_path):
    """boilerplate_seg_words adds stage 00b: a nav-bar prefix shared by
    two distinct docs of one source is stripped before quality/dedup see
    the text (re-exposing a planted exact duplicate the nav prefix had
    masked); resume skips the stage; toggling the knob in the same
    out_dir invalidates 01_quality onward."""
    pdf = _corpus()
    nav = "home about contact privacy terms nav bar links"  # 8 words
    # rows 0 and 3 are DISTINCT base docs; row 1 is row 0's planted exact
    # duplicate — move it to another source so segment grouping stays
    # within s0 for the nav pair only
    pdf.loc[0, "text"] = nav + " " + pdf.loc[0, "text"]
    pdf.loc[3, "text"] = nav + " " + pdf.loc[3, "text"]
    pdf.loc[0, "source"] = pdf.loc[3, "source"] = "s0"
    pdf.loc[1, "source"] = "s2"
    docs = spark.createDataFrame(pdf)
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    out = str(tmp_path / "bp")
    kw = dict(budget=10**6, min_words=8, boilerplate_seg_words=8)

    res = prepare_corpus(spark, docs, ev, out, **kw)
    f = res["funnel"]
    assert f["00b_boilerplate"] == f["00_input"]  # rows pass through
    cleaned = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out + "/00b_boilerplate/data").collect()
    }
    # nav stripped from both carriers, untouched elsewhere
    assert not cleaned[0].startswith("home about")
    assert not cleaned[3].startswith("home about")
    assert cleaned[0] == pdf.loc[1, "text"]  # dup re-exposed
    assert f["02_dedup"] < f["01_quality"]

    # resume: stage read back, selection byte-identical
    res2 = prepare_corpus(spark, docs, ev, out, **kw)
    assert res2["stages"]["00b_boilerplate"] == "skipped"
    assert res2["stages"]["01_quality"] == "skipped"
    sel1 = sorted(r["doc_id"] for r in res["selected"].collect())
    sel2 = sorted(r["doc_id"] for r in res2["selected"].collect())
    assert sel1 == sel2

    # knob off in the same dir -> quality spec changes -> re-runs
    res3 = prepare_corpus(spark, docs, ev, out, budget=10**6, min_words=8)
    assert res3["stages"]["01_quality"] == "ran"
