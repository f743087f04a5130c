"""Differential: batched token battery == scalar path (rel <= 1e-12).

The batched kernels (functions/battery.py token_features_batch,
kernels.py fastdfa_batch / fft_dominant_freq_batch) must reproduce the
scalar 18-stat battery — same formulas run axis-wise over same-length
groups. The only intended numeric deviation is the DFA log-log slope
(closed-form OLS vs np.polyfit's scaled lstsq), bounded at 1e-12 relative.
"""

import numpy as np
import pytest

from mpds_spark.functions import kernels as K
from mpds_spark.functions.battery import token_features, token_features_batch
from mpds_spark.sources.synth import tokens_for


def _assert_feature_close(got, exp):
    got, exp = np.asarray(got), np.asarray(exp)
    assert got.shape == exp.shape
    both_nan = np.isnan(got) & np.isnan(exp)
    np.testing.assert_allclose(
        np.where(both_nan, 0.0, got),
        np.where(both_nan, 0.0, exp),
        rtol=1e-12,
        atol=0.0,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_matches_scalar_synth_lengths(seed):
    rng = np.random.default_rng(seed)
    lens = rng.integers(8, 300, size=120).tolist() + [8, 8, 8, 9, 4096, 1031]
    arrs = [tokens_for(i, int(n), 42) for i, n in enumerate(lens)]
    got = token_features_batch(arrs)
    for i, a in enumerate(arrs):
        _assert_feature_close(got[i], token_features(np.asarray(a, np.int64)))


def test_batch_edge_lengths():
    # below the DFA/FFT minimums: dfa nan (n<8), dfc nan (n<4), tkeo nan (n<3)
    arrs = [
        np.array([5], dtype=np.int64),
        np.array([5, 7], dtype=np.int64),
        np.array([1, 1, 1, 1, 1, 1, 1, 1], dtype=np.int64),  # constant: std 0
        np.arange(7, dtype=np.int64),
    ]
    got = token_features_batch(arrs)
    for i, a in enumerate(arrs):
        _assert_feature_close(got[i], token_features(a))


def test_batch_order_preserved_across_length_groups():
    # interleaved lengths: output row order must match input order
    arrs = [tokens_for(i, 8 + (i % 3) * 50, 7) for i in range(30)]
    got = token_features_batch(arrs)
    exp = np.stack([token_features(np.asarray(a, np.int64)) for a in arrs])
    _assert_feature_close(got, exp)


def test_fastdfa_batch_matches_scalar():
    rng = np.random.default_rng(3)
    for n in (8, 16, 100, 511, 512, 4096):
        X = rng.normal(size=(5, n))
        got = K.fastdfa_batch(X)
        exp = np.array([K.fastdfa(X[i]) for i in range(5)])
        _assert_feature_close(got, exp)


def test_fastdfa_batch_constant_rows():
    # constant rows: all flucts zero -> log10 -inf everywhere -> nan alpha
    X = np.ones((3, 64))
    got = K.fastdfa_batch(X)
    exp = np.array([K.fastdfa(X[i]) for i in range(3)])
    assert np.isnan(got).all() == np.isnan(exp).all()


def test_fft_batch_matches_scalar():
    rng = np.random.default_rng(4)
    for n in (4, 9, 256):
        X = rng.normal(size=(6, n))
        f, p = K.fft_dominant_freq_batch(X)
        for i in range(6):
            ef, ep = K.fft_dominant_freq(X[i])
            _assert_feature_close([f[i], p[i]], [ef, ep])


def test_chunk_tokens_passthrough_and_bounds(spark):
    """Chunk values are byte-identical slices; disjoint default covers
    every token exactly once; stride<length overlaps; remainder control."""
    from mpds_spark.operators.battery import chunk_tokens

    toks = list(range(100, 110))
    df = spark.createDataFrame(
        [(1, toks), (2, [7]), (3, [])], "doc_id int, tokens array<int>"
    )
    rows = chunk_tokens(df, 4).orderBy("doc_id", "chunk_id").collect()
    got = [(r["doc_id"], r["chunk_id"], r["tokens"]) for r in rows]
    assert got == [
        (1, 0, toks[0:4]), (1, 1, toks[4:8]), (1, 2, toks[8:10]),
        (2, 0, [7]),
    ]
    # reassembling disjoint chunks reproduces the doc exactly
    assert sum((c for _, _, c in got[:3]), []) == toks
    # full windows only
    full = chunk_tokens(df, 4, keep_remainder=False).collect()
    assert all(r["n_tok_chunk"] == 4 for r in full) and len(full) == 2
    # overlapping stride
    ov = (
        chunk_tokens(df, 4, stride=2, keep_remainder=False)
        .filter("doc_id = 1").orderBy("chunk_id").collect()
    )
    assert [r["tokens"] for r in ov] == [toks[i:i+4] for i in (0, 2, 4, 6)]
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_tokens(df, 0)
