import numpy as np
import pandas as pd
import pytest

import oracles

from mpds_spark.functions.battery import (
    AUDIO_FEATURE_NAMES,
    extract_audio_features,
    extract_react_features,
    extract_tap_features,
    react_feature_names,
    reaction_lags,
    tap_feature_names,
)
from mpds_spark.operators.battery import (
    extract_audio_battery,
    extract_react_battery,
    extract_tap_battery,
)


def _tap_recording(rng, n=300):
    t = np.cumsum(rng.uniform(0.02, 0.2, n)) + 100.0
    x = np.repeat(np.tile([120.0, 380.0], n // 10 + 1), 5)[:n] + rng.normal(
        0, 8, n
    )
    y = 200.0 + rng.normal(0, 15, n)
    return t, x, y


def _react_recording(rng, n=400):
    t = np.cumsum(rng.uniform(0.01, 0.05, n))
    visible = np.zeros(n, dtype=int)
    pressed = np.zeros(n, dtype=int)
    i = 0
    while i < n - 30:
        i += int(rng.integers(10, 25))
        on = int(rng.integers(8, 20))
        visible[i : i + on] = 1
        lagn = int(rng.integers(1, 6))
        pressed[i + lagn : i + on + lagn] = 1
        i += on + lagn
    return t, visible, pressed


def _audio_recording(rng, fs=8000, secs=6.0):
    t = np.arange(0, secs, 1 / fs)
    x = 0.01 * rng.normal(size=len(t))
    # voiced middle: 2.0-4.5 s, 220 Hz tone
    voiced = (t >= 2.0) & (t < 4.5)
    x[voiced] += 0.8 * np.sin(2 * np.pi * 220.0 * t[voiced])
    return x


def test_reaction_lags_matches_loop_oracle():
    rng = np.random.default_rng(43)
    t, v, p = _react_recording(rng)
    got = reaction_lags(t, v, p)
    exp = oracles.reaction_lags_loop(t, v, p)
    np.testing.assert_allclose(got, exp)
    assert len(got) > 5


def test_reaction_lags_trailing_open_run():
    t = np.array([0.0, 1.0, 2.0, 3.0])
    v = np.array([0, 1, 1, 1])
    p = np.array([0, 0, 0, 0])  # mismatch never closes
    assert len(reaction_lags(t, v, p)) == 0
    exp = oracles.reaction_lags_loop(t, v, p)
    assert len(exp) == 0


def test_tap_features_shape_and_sanity():
    rng = np.random.default_rng(47)
    t, x, y = _tap_recording(rng)
    vec = extract_tap_features(t, x, y)
    names = tap_feature_names()
    assert len(vec) == len(names) == 151
    d = dict(zip(names, vec))
    assert d["ntaps"] > 10
    assert 0 <= d["scaled_x_mean"] <= 1.5


def test_react_features_shape():
    rng = np.random.default_rng(53)
    t, v, p = _react_recording(rng)
    vec = extract_react_features(t, v, p)
    names = react_feature_names()
    assert len(vec) == len(names) == 15
    d = dict(zip(names, vec))
    assert d["touch_sum"] > 0
    assert d["touch_mean"] == pytest.approx(
        d["touch_sum"] / len(reaction_lags(t, v, p))
    )


def test_audio_features_voice_detection():
    rng = np.random.default_rng(59)
    fs = 8000
    x = _audio_recording(rng, fs=fs)
    vec = extract_audio_features(x, fs)
    d = dict(zip(AUDIO_FEATURE_NAMES, vec))
    assert len(vec) == 17
    # voiced run 2.0-4.5s = 5 frames -> len 2.5s (frame end semantics)
    assert 1.5 <= d["length"] <= 3.0
    assert d["pitch"] == pytest.approx(220.0, abs=fs / 10240 * 3)
    assert d["amp_mean"] > 0.5


def test_audio_features_silence_returns_nan():
    x = np.zeros(8000 * 3)
    vec = extract_audio_features(x, 8000)
    assert np.isnan(vec).all()


def test_spark_batteries_match_numpy(spark):
    rng = np.random.default_rng(61)
    taps, reacts, audios = [], [], []
    for e in range(2):
        t, x, y = _tap_recording(rng, n=200)
        taps.append(
            pd.DataFrame({"entity_id": f"e{e}", "ts": 1.0, "t": t, "x": x, "y": y})
        )
        t, v, p = _react_recording(rng, n=200)
        reacts.append(
            pd.DataFrame(
                {
                    "entity_id": f"e{e}",
                    "ts": 1.0,
                    "t": t,
                    "btn_visible": v,
                    "btn_pressed": p,
                }
            )
        )
        audios.append(
            {
                "rec_id": e,
                "sample": _audio_recording(rng, fs=4000, secs=4.0).tolist(),
                "fs": 4000,
            }
        )
    tap_pdf = pd.concat(taps, ignore_index=True)
    got = (
        extract_tap_battery(spark.createDataFrame(tap_pdf))
        .orderBy("entity_id")
        .toPandas()
    )
    for _, row in got.iterrows():
        g = tap_pdf[tap_pdf.entity_id == row.entity_id]
        exp = extract_tap_features(
            g["t"].to_numpy(), g["x"].to_numpy(), g["y"].to_numpy()
        )
        np.testing.assert_allclose(
            np.asarray(row["features"], float), exp, rtol=1e-12, equal_nan=True
        )

    react_pdf = pd.concat(reacts, ignore_index=True)
    got = (
        extract_react_battery(spark.createDataFrame(react_pdf))
        .orderBy("entity_id")
        .toPandas()
    )
    for _, row in got.iterrows():
        g = react_pdf[react_pdf.entity_id == row.entity_id]
        exp = extract_react_features(
            g["t"].to_numpy(), g["btn_visible"].to_numpy(), g["btn_pressed"].to_numpy()
        )
        np.testing.assert_allclose(
            np.asarray(row["features"], float), exp, rtol=1e-12, equal_nan=True
        )

    audio_df = spark.createDataFrame(
        pd.DataFrame(audios), "rec_id long, sample array<double>, fs long"
    )
    got = extract_audio_battery(audio_df).orderBy("rec_id").toPandas()
    for _, row in got.iterrows():
        src = audios[int(row["rec_id"])]
        exp = extract_audio_features(np.asarray(src["sample"]), src["fs"])
        np.testing.assert_allclose(
            np.asarray(row["features"], float), exp, rtol=1e-12, equal_nan=True
        )
