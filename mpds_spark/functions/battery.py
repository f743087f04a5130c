"""Feature-battery assembly: the reference's stat battery applied to one
sequence, as pure numpy (called from the Spark operators in
operators/battery.py inside Arrow UDFs).

Layout parity: extractAccelTestV2.m:49-59 header contract — features are a
positional vector with a names manifest, reshaped row-major (stat-major per
axis: for each axis, the 18 stats in order).
"""

from __future__ import annotations

import numpy as np

from mpds_spark.functions import kernels as K
from mpds_spark.functions import mlstats as S

STAT_NAMES = [
    "mean", "std", "q1", "q3", "iqr", "median", "mode", "range",
    "s", "k", "mse", "En", "zcr", "dfc", "dfc_amp", "meanTKEO", "ar1", "dfa",
]

CROSS_NAMES = ["xcorr", "mi", "xEn"]


def stat_battery(
    a: np.ndarray,
    t: np.ndarray,
    min_f: float = 0.5,
    max_f: float = 20.0,
    regular_grid: bool = False,
) -> np.ndarray:
    """The 18-stat battery of extractAccelTestV2.m:72-101 for ONE channel.

    Order matches STAT_NAMES. t is the sample time vector (irregular ok);
    dfc/dfc_amp use the (min_f, max_f) Lomb-Scargle band (:60-71 uses
    0.5-20 Hz for 50-200 Hz accel sampling).
    """
    a = np.asarray(a, dtype=float)
    q1 = float(S.prctile(a, 25)[0])
    q3 = float(S.prctile(a, 75)[0])
    if regular_grid:
        dfc, dfc_amp = K.fft_dominant_freq(a, min_f, max_f)
    else:
        dfc, dfc_amp = K.dominant_freq(a, t, min_f, max_f)
    return np.array(
        [
            a.mean(),
            S.matlab_std(a),
            q1,
            q3,
            q3 - q1,
            S.matlab_median(a),
            S.matlab_mode(a),
            a.max() - a.min(),
            S.skewness(a),
            S.kurtosis(a),
            float(np.mean(a * a)),
            S.entropy(a),
            K.zcr(S.normalize_z(a)),
            dfc,
            dfc_amp,
            K.mean_tkeo(a),
            K.ar1(a),
            K.fastdfa(a),
        ]
    )


def cross_battery(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """extractAccelTestV2.m:115-120: [corrcoef, binned MI, entropy(a) +
    KL(round(a*1e4) || round(b*1e4))] for one channel pair."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    corr = float(np.corrcoef(a, b)[0, 1])
    mi = S.mi_binned(a, b)
    xen = S.entropy(a) + S.relative_entropy(
        np.floor(np.abs(a * 1e4) + 0.5) * np.sign(a * 1e4),  # MATLAB round
        np.floor(np.abs(b * 1e4) + 0.5) * np.sign(b * 1e4),
    )
    return np.array([corr, mi, xen])


ACCEL_AXES = ["x", "y", "z", "acc", "a", "e", "r"]
ACCEL_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)]


def accel_feature_names() -> list[str]:
    names = [f"{ax}_{st}" for ax in ACCEL_AXES for st in STAT_NAMES]
    for i, j in ACCEL_PAIRS:
        for c in CROSS_NAMES:
            names.append(f"{ACCEL_AXES[i]}_{ACCEL_AXES[j]}_{c}")
    return names


def extract_accel_features(
    t: np.ndarray, x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> np.ndarray:
    """extractAccelTestV2.m end-to-end for one recording: axis reorder by
    gravity, mean gravity removal, magnitude + spherical channels, 7x18 stat
    battery + 9x3 cross features = 153 doubles (accel_feature_names order).

    Note the reference's channel quirks (faithfully kept): magnitude and
    spherical channels are computed from the RAW xyz (data), not the
    reordered/de-gravitied ones (extractAccelTestV2.m:39-45)."""
    t = np.asarray(t, dtype=float)
    raw = np.stack([x, y, z], axis=1).astype(float)
    reord = K.gravity_reorder(raw)
    nog = K.rmgravity_mean(reord)
    mag = np.sqrt((raw * raw).sum(axis=1))
    a, e, r = K.cart2sph(raw[:, 0], raw[:, 1], raw[:, 2])
    channels = [nog[:, 0], nog[:, 1], nog[:, 2], mag, a, e, r]
    stats = np.concatenate([stat_battery(c, t) for c in channels])
    cross = np.concatenate(
        [cross_battery(channels[i], channels[j]) for i, j in ACCEL_PAIRS]
    )
    return np.concatenate([stats, cross])


TOKEN_STAT_NAMES = [f"tok_{s}" for s in STAT_NAMES]


def token_features(tokens: np.ndarray) -> np.ndarray:
    """The 18-stat battery over one token sequence (the BASELINE.json input:
    one pre-tokenized row = one recording; implicit unit-step time grid)."""
    a = np.asarray(tokens, dtype=float)
    t = np.arange(len(a), dtype=float)
    # unit-step grid: band-limit to (0.01, 0.5] (grid Nyquist); FFT
    # periodogram (O(n log n)) — Lomb is for irregular timestamps only
    return stat_battery(a, t, min_f=0.01, max_f=0.5, regular_grid=True)
