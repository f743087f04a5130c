"""dedup_corpus pipeline: end-to-end keep list + kill/resume contract
(VERDICT r2 #7): killing the run after stage k and resuming must produce a
keep list byte-identical to an uninterrupted run, re-running NO completed
stage."""

import numpy as np
import pandas as pd

from mpds_spark.pipelines.dedup_corpus import dedup_corpus


def _corpus(seed=5):
    """20 base docs + exact duplicates (every 3rd) + near-dup variants
    (every 4th: last word swapped — Jaccard ~0.54 over 3-shingles)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    did = 0
    for b in range(20):
        words = [str(w) for w in rng.choice(vocab, size=12, replace=True)]
        base = " ".join(words)
        rows.append((f"d{did:03d}", base))
        did += 1
        if b % 3 == 0:
            rows.append((f"d{did:03d}", base))  # exact dup
            did += 1
        if b % 4 == 0:
            rows.append((f"d{did:03d}", " ".join(words[:-1] + ["zz"])))
            did += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_dedup_corpus_end_to_end_and_resume(spark, tmp_path):
    docs = spark.createDataFrame(_corpus())

    full = dedup_corpus(spark, docs, str(tmp_path / "full"), threshold=0.5)
    assert full["stages"]["02_pairs"] == "ran"
    assert full["stages"]["04_keep"] == "ran"
    a = (
        full["keep"].toPandas().sort_values("doc_id").reset_index(drop=True)
    )

    # exact dups collapsed: every non-kept doc maps to a kept representative
    kept_ids = set(a[a["keep"]]["doc_id"])
    assert 0 < len(kept_ids) < len(a)
    assert set(a["component"]) <= set(a["exact_rep"])
    for _, r in a.iterrows():
        assert (r["doc_id"] == r["exact_rep"]) or (r["exact_rep"] in set(a["doc_id"]))

    # ---- kill after stage 2, resume, byte-identical keep list
    d2 = str(tmp_path / "resume")
    part = dedup_corpus(spark, docs, d2, threshold=0.5, stop_after=2)
    assert part["keep"] is None
    assert part["stages"]["02_pairs"] == "ran"

    res = dedup_corpus(spark, docs, d2, threshold=0.5)
    assert res["stages"]["01_exact"] == "skipped"  # per-bucket lineage hit
    assert res["stages"]["02_pairs"] == "skipped"
    assert res["stages"]["03_components"] == "ran"
    b = res["keep"].toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # a second full resume re-runs NOTHING and still reads the same verdict
    res2 = dedup_corpus(spark, docs, d2, threshold=0.5)
    assert all(v == "skipped" for v in res2["stages"].values())
    c = res2["keep"].toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, c)


def test_dedup_corpus_spec_change_invalidates_downstream_only(spark, tmp_path):
    """Changing a stage-2 parameter must re-run stages 2-4 but keep the
    per-bucket stage-1 lineage valid (spec strings chain downstream)."""
    docs = spark.createDataFrame(_corpus(seed=9))
    d = str(tmp_path / "run")
    dedup_corpus(spark, docs, d, threshold=0.5)
    res = dedup_corpus(spark, docs, d, threshold=0.4)
    assert res["stages"]["01_exact"] == "skipped"
    assert res["stages"]["02_pairs"] == "ran"
    assert res["stages"]["04_keep"] == "ran"


def test_dedup_corpus_simhash_backend(spark, tmp_path):
    """pair_method='simhash' swaps stage 2 for the SimHash Hamming-band
    backend: exact dups still collapse, the pipeline resumes (spec embeds
    the method so a backend switch invalidates stages 2-4), and an
    unknown method raises."""
    import pytest

    docs = spark.createDataFrame(_corpus())
    out = str(tmp_path / "sh")
    r1 = dedup_corpus(spark, docs, out, pair_method="simhash", max_hamming=3)
    k = r1["keep"].toPandas()
    n_docs = len(k)
    n_kept = int(k["keep"].sum())
    assert n_kept < n_docs  # planted exact dups collapsed at minimum
    # exact dups: same text_hash -> exactly one keeper per hash group
    assert (
        k.groupby("text_hash")
        .apply(lambda g: (g["doc_id"] == g["exact_rep"]).sum(), include_groups=False)
        .eq(1)
        .all()
    )
    # rerun skips; identical verdicts
    r2 = dedup_corpus(spark, docs, out, pair_method="simhash", max_hamming=3)
    assert r2["stages"]["02_pairs"] == "skipped"
    assert sorted(map(tuple, r2["keep"].collect())) == sorted(
        map(tuple, r1["keep"].collect())
    )
    # switching backend in the SAME dir invalidates stage 2 downstream
    r3 = dedup_corpus(spark, docs, out, pair_method="minhash")
    assert r3["stages"]["02_pairs"] == "ran"
    with pytest.raises(ValueError):
        dedup_corpus(spark, docs, str(tmp_path / "bad"), pair_method="nope")


def test_dedup_corpus_winnow_backend(spark, tmp_path):
    """pair_method='winnow' (VERDICT r4 ask #7): passage-level shared
    winnowing fingerprints catch a copied >=w+n-1-word block inside
    otherwise-distinct documents — the case whole-doc MinHash dilutes —
    and the backend honors the same kill/resume contract (spec embeds the
    method + knobs, so a backend switch invalidates stages 2-4)."""
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(400)]
    passage = [f"p{i}" for i in range(10)]  # the copied block
    rows = []
    for i in range(12):
        words = [str(w) for w in rng.choice(vocab, size=30, replace=True)]
        if i in (2, 7):  # plant the same 10-word passage in two docs
            words[10:10] = passage
        rows.append((f"d{i:03d}", " ".join(words)))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )

    out = str(tmp_path / "wn")
    # kill after stage 2, resume: byte-identical keep list, nothing re-run
    part = dedup_corpus(
        spark, docs, out, pair_method="winnow", min_shared=2, stop_after=2
    )
    assert part["keep"] is None and part["stages"]["02_pairs"] == "ran"
    r1 = dedup_corpus(spark, docs, out, pair_method="winnow", min_shared=2)
    assert r1["stages"]["01_exact"] == "skipped"
    assert r1["stages"]["02_pairs"] == "skipped"
    k = r1["keep"].toPandas().set_index("doc_id")
    # the two passage-sharing docs share a component; exactly one kept
    assert k.loc["d002", "component"] == k.loc["d007", "component"]
    assert int(k.loc[["d002", "d007"], "keep"].sum()) == 1
    # MinHash whole-doc backend does NOT pair them at the same corpus
    # (Jaccard ~10/50 over 3-shingles, below the 0.5 threshold)
    r_mh = dedup_corpus(
        spark, docs, str(tmp_path / "mh"), pair_method="minhash"
    )
    km = r_mh["keep"].toPandas().set_index("doc_id")
    assert km.loc["d002", "component"] != km.loc["d007", "component"]
    # switching backend in the SAME dir invalidates stage 2 downstream
    r2 = dedup_corpus(spark, docs, out, pair_method="simhash")
    assert r2["stages"]["02_pairs"] == "ran"
