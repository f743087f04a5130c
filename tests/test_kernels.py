import numpy as np
import pytest

import oracles

from mpds_spark.functions import kernels as K
from mpds_spark.functions import mlstats as S
from mpds_spark.functions.battery import (
    accel_feature_names,
    extract_accel_features,
    token_features,
)


# ------------------------------------------------------- MATLAB conventions

def test_prctile_matlab_convention():
    # hand-checked against MATLAB prctile semantics
    np.testing.assert_allclose(S.prctile([1, 2, 3, 4], 50), [2.5])
    np.testing.assert_allclose(S.prctile([1, 2, 3], 25), [1.25])
    np.testing.assert_allclose(S.prctile([1, 2, 3, 4], 25), [1.5])
    np.testing.assert_allclose(S.prctile([5], 75), [5.0])
    # clamp outside the midpoint range
    np.testing.assert_allclose(S.prctile([1, 2, 3, 4], 5), [1.0])
    np.testing.assert_allclose(S.prctile([1, 2, 3, 4], 99), [4.0])


def test_kurtosis_skewness_biased():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    # MATLAB kurtosis([1 2 3 4]) = 1.64 (biased, non-excess)
    assert S.kurtosis(x) == pytest.approx(1.64)
    assert S.skewness(x) == pytest.approx(0.0, abs=1e-12)
    x2 = np.array([1.0, 1.0, 1.0, 5.0])
    # m2 = 3, m3 = 6 -> 6/3^1.5
    assert S.skewness(x2) == pytest.approx(6 / 3**1.5)


def test_mode_smallest_most_frequent():
    assert S.matlab_mode([3, 1, 1, 3, 2]) == 1.0
    assert S.matlab_mode([2.5, 2.5, 7.0]) == 2.5


def test_entropy_value_counts():
    # uniform over 4 distinct values -> 2 bits (+eps negligible)
    assert S.entropy([1, 2, 3, 4]) == pytest.approx(2.0, abs=1e-9)
    assert S.entropy([5, 5, 5]) == pytest.approx(0.0, abs=1e-9)


def test_mutual_information_identities():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4, 200)
    y = rng.integers(0, 4, 200)
    assert S.mutual_information(x, x) == pytest.approx(S.entropy(x), abs=1e-9)
    assert S.mutual_information(x, y) < S.entropy(x)
    assert S.conditional_entropy(x, x) == pytest.approx(0.0, abs=1e-9)


def test_relative_entropy_zero_for_identical():
    x = np.array([1, 2, 2, 3])
    assert S.relative_entropy(x, x) == pytest.approx(0.0, abs=1e-12)
    assert S.relative_entropy(x, np.array([1, 1, 2, 3])) > 0


def test_mi_binned_self_vs_independent():
    rng = np.random.default_rng(1)
    a = rng.normal(size=500)
    b = rng.normal(size=500)
    assert S.mi_binned(a, a) > S.mi_binned(a, b)
    assert S.mi_binned(a, b) >= 0.0 or abs(S.mi_binned(a, b)) < 0.5


# ----------------------------------------------------------------- kernels

def test_zcr_reference_example():
    # ZCR.m docstring example: x = [1 2 -3 4 5 -6 -2 -6 2] -> 0.444...
    x = np.array([1, 2, -3, 4, 5, -6, -2, -6, 2], dtype=float)
    assert K.zcr(x) == pytest.approx(4 / 9)


def test_tkeo_and_ar1_closed_forms():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    # TKEO of a linear ramp is constant 1... x[i]^2 - x[i+1]x[i-1] = 1
    assert K.mean_tkeo(x) == pytest.approx(1.0)
    # AR1 of x[t] = x[t-1] scaled
    y = 2.0 ** np.arange(8)
    assert K.ar1(y) == pytest.approx(2.0)


@pytest.mark.parametrize("n", [64, 100, 255, 1000, 4096])
def test_fastdfa_matches_loop_oracle(n):
    rng = np.random.default_rng(n)
    x = rng.normal(size=n)
    assert K.fastdfa(x) == pytest.approx(oracles.fastdfa_loop(x), rel=1e-12)


def test_fastdfa_known_exponents():
    rng = np.random.default_rng(7)
    # white noise: alpha ~ 0.5; its cumsum (random walk input): alpha ~ 1.5
    wn = rng.normal(size=8192)
    assert K.fastdfa(wn) == pytest.approx(0.5, abs=0.08)
    assert K.fastdfa(np.cumsum(wn)) == pytest.approx(1.5, abs=0.12)


def test_dominant_freq_finds_injected_tone():
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 10, 800))  # irregular sampling
    x = np.sin(2 * np.pi * 3.0 * t) + 0.1 * rng.normal(size=len(t))
    dfc, amp = K.dominant_freq(x, t, 0.5, 20.0)
    assert dfc == pytest.approx(3.0, abs=0.1)
    assert amp > 0


def test_tap_segments_matches_loop_oracle():
    rng = np.random.default_rng(5)
    t = np.cumsum(rng.uniform(0.01, 0.2, 300))
    # alternate around two zones with dwell
    x = np.repeat(np.tile([100.0, 300.0], 30), 5)[:300] + rng.normal(
        0, 5, 300
    )
    stay, move = K.tap_segments(t, x)
    o_stay, o_move = oracles.tap_segments_loop(t, x)
    np.testing.assert_allclose(stay, o_stay)
    np.testing.assert_allclose(move, o_move)


def test_pwelch_pitch_finds_tone():
    fs = 8000.0
    t = np.arange(0, 1.0, 1 / fs)
    x = np.sin(2 * np.pi * 440.0 * t)
    pitch = K.pwelch_pitch(x, fs, nfft=512)
    assert pitch == pytest.approx(440.0, abs=fs / 512)


def test_gravity_reorder_and_rmgravity():
    rng = np.random.default_rng(9)
    xyz = rng.normal(0, 1, size=(500, 3))
    xyz[:, 2] += 9.8  # gravity on z
    out = K.gravity_reorder(xyz)
    assert abs(out[:, 0].mean()) == pytest.approx(9.8, abs=0.2)
    nog = K.rmgravity_mean(out)
    np.testing.assert_allclose(nog.mean(axis=0), 0.0, atol=1e-12)


# ----------------------------------------------------------------- battery

def test_accel_battery_shape_and_names():
    rng = np.random.default_rng(11)
    n = 600
    t = np.cumsum(rng.uniform(0.004, 0.008, n))
    x = np.sin(2 * np.pi * 2.0 * t) + 0.05 * rng.normal(size=n)
    y = 0.5 * np.sin(2 * np.pi * 5.0 * t) + 0.05 * rng.normal(size=n)
    z = 9.8 + 0.05 * rng.normal(size=n)
    names = accel_feature_names()
    vec = extract_accel_features(t, x, y, z)
    assert len(names) == 153 == len(vec)
    d = dict(zip(names, vec))
    # gravity axis (largest |mean|) is z -> channel 'x' after reorder
    assert d["x_mean"] == pytest.approx(0.0, abs=1e-9)  # mean-removed
    assert d["y_dfc"] == pytest.approx(2.0, abs=0.25)  # injected 2 Hz tone
    assert np.isfinite(vec).all()


def test_token_battery_deterministic():
    rng = np.random.default_rng(13)
    toks = rng.integers(0, 50257, 512)
    v1 = token_features(toks)
    v2 = token_features(toks.copy())
    np.testing.assert_array_equal(v1, v2)
    assert len(v1) == 18
    assert v1[0] == pytest.approx(toks.mean())
