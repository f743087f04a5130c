"""Sequence kernels: numpy transcriptions of the reference's signal code.

Each consumes one ordered 1-D sequence (one entity x timestamp recording /
one token row) and returns scalars or small vectors. They run inside
Arrow-vectorized pandas UDFs (operators/battery.py) — numpy per sequence,
never per-row Python.

Transcription sources:
- zcr               ← feature_extraction/ZCR.m:15
- mean_tkeo         ← feature_extraction/FeatureMeanTKEO.m:6-9
- ar1               ← feature_extraction/FeatureAR1.m:6-11 (no-intercept
                      least squares: sum(x_t*x_{t-1})/sum(x_{t-1}^2))
- fastdfa           ← feature_extraction/fastdfa.m:23-33 +
                      fastdfa_core.c:41-161,255-263 (operates on the
                      CUMULATIVE SUM of the input; binary-subdivision
                      interval widths round(n/2^k); per-interval linear
                      detrend with closed-form Sx/Sxx on absolute indices;
                      leftover tail kept as raw signal => zero residual;
                      alpha = slope of polyfit(log10 intervals, log10 flucts))
- lomb_scargle      ← semantics of MATLAB plomb as used in
                      extractAccelTestV2.m:60-71 (default 4x oversampled
                      frequency grid; dfc = argmax frequency — invariant to
                      PSD normalization; amplitude uses the classic
                      Lomb power, documented convention)
- cart2sph          ← extractAccelTestV2.m:42-45
- gravity_reorder   ← extractAccelTestV2.m:28-36
- rmgravity         ← extractAccelTestV2.m:38-39 ('mean' mode: per-axis mean
                      subtraction — function missing from the reference repo,
                      semantics reconstructed from the call site; documented)
- tap_segments      ← extractTapTestV2.m:26-51 (sign-change state machine
                      emitting Tstay/Tmove dwell and transition durations)
- pwelch_pitch      ← feature_extraction/getPitch.m:10-18 (Welch PSD with
                      hamming(NFFT), 50% overlap, peak pick)
"""

from __future__ import annotations

import numpy as np


def zcr(x: np.ndarray) -> float:
    """ZCR.m: sum(abs(diff(x>0)))/length(x)."""
    x = np.asarray(x, dtype=float)
    return float(np.sum(np.abs(np.diff((x > 0).astype(np.int64)))) / len(x))


def mean_tkeo(x: np.ndarray) -> float:
    """FeatureMeanTKEO.m: mean(x[1:m-1]^2 - x[2:m]*x[0:m-2])."""
    x = np.asarray(x, dtype=float)
    m = len(x)
    if m < 3:
        return np.nan
    return float(np.mean(x[1 : m - 1] ** 2 - x[2:m] * x[0 : m - 2]))


def ar1(x: np.ndarray) -> float:
    """FeatureAR1.m: regress(x[2:], x[:-1]) — no-intercept OLS coefficient."""
    x = np.asarray(x, dtype=float)
    if len(x) < 2:
        return np.nan
    prev = x[:-1]
    nxt = x[1:]
    denom = np.dot(prev, prev)
    return float(np.dot(prev, nxt) / denom) if denom != 0 else np.nan


def _dfa_intervals(n: int) -> np.ndarray:
    """fastdfa_core.c:255-263 + 58-75: binary-subdivision interval widths."""
    n_scales = int(np.log10(n) / np.log10(2.0))
    if float(1 << (n_scales - 1)) > n / 2.5:
        n_scales -= 1
    scales = np.arange(n_scales)
    subdivs = 1 << scales
    return (n / subdivs + 0.5).astype(np.int64)  # (unsigned long)(x + 0.5)


def _dfa_flucts(y: np.ndarray, intervals: np.ndarray) -> np.ndarray:
    """fastdfa_core.c:80-161 (dfa) on the accumulated signal y, vectorized
    per scale by reshaping full intervals into a (k, m) matrix."""
    n = len(y)
    flucts = np.empty(len(intervals), dtype=float)
    for s, m in enumerate(intervals):
        m = int(m)
        k = n // m  # number of complete intervals
        resid_sq = 0.0
        if k > 0:
            xm = y[: k * m].reshape(k, m)
            starts = np.arange(k, dtype=float) * m
            ends = starts + m - 1
            j = np.arange(m, dtype=float)
            sy = xm.sum(axis=1)
            sxy = starts * sy + (xm * j).sum(axis=1)
            sx = (ends + starts) * m / 2.0
            sxx = m * (
                2 * ends**2 + 2 * starts**2 + 2 * starts * ends + ends - starts
            ) / 6.0
            delta = m * sxx - sx * sx
            b = (sy * sxx - sx * sxy) / delta
            a = (m * sxy - sx * sy) / delta
            trend = a[:, None] * (starts[:, None] + j[None, :]) + b[:, None]
            resid_sq = float(((xm - trend) ** 2).sum())
        # tail elements (idx >= k*m): trend[i] = y[i] => zero residual
        flucts[s] = np.sqrt(resid_sq / n)
    return flucts


def fastdfa(x: np.ndarray) -> float:
    """fastdfa.m: scaling exponent alpha of the input signal.

    The C core receives the CUMULATIVE SUM of x (fastdfa_core.c:214), windows
    it, detrends per interval, and alpha is the log-log slope. polyfit runs
    over the scale-ordered (unsorted) vectors, which gives the identical
    slope as the sorted ones (fastdfa.m:28-33)."""
    x = np.asarray(x, dtype=float)
    if len(x) < 8:
        return np.nan
    y = np.cumsum(x)
    intervals = _dfa_intervals(len(y))
    if len(intervals) < 2:
        return np.nan
    flucts = _dfa_flucts(y, intervals)
    with np.errstate(divide="ignore"):
        lx = np.log10(intervals.astype(float))
        ly = np.log10(flucts)
    ok = np.isfinite(ly)
    if ok.sum() < 2:
        return np.nan
    return float(np.polyfit(lx[ok], ly[ok], 1)[0])


def lomb_scargle(
    x: np.ndarray, t: np.ndarray, fmax: float, ofac: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Lomb-Scargle periodogram on irregular samples (plomb semantics).

    Frequency grid: k * 1/(ofac*span) for k=1.., up to fmax (MATLAB plomb's
    default 4x oversampling). Power: classic Lomb
      P(w) = [ (sum xc*cos w(t-tau))^2 / sum cos^2 +
               (sum xc*sin w(t-tau))^2 / sum sin^2 ] / 2
    with x mean-centered. The dominant-frequency feature (argmax) is
    invariant to the PSD normalization constant; the amplitude feature uses
    this classic power (documented convention — MATLAB's 'psd' scaling
    differs by a constant factor)."""
    t = np.asarray(t, dtype=float)
    x = np.asarray(x, dtype=float)
    span = t.max() - t.min()
    df = 1.0 / (ofac * span)
    k = int(np.floor(fmax / df))
    f = df * np.arange(1, k + 1)
    xc = x - x.mean()
    w = 2.0 * np.pi * f[:, None]  # (F, 1)
    wt = w * t[None, :]  # (F, n)
    tau = np.arctan2(np.sin(2 * wt).sum(axis=1), np.cos(2 * wt).sum(axis=1)) / (
        2.0 * w[:, 0]
    )
    arg = w * (t[None, :] - tau[:, None])
    c = np.cos(arg)
    s = np.sin(arg)
    pc = (xc[None, :] * c).sum(axis=1) ** 2 / (c**2).sum(axis=1)
    ps = (xc[None, :] * s).sum(axis=1) ** 2 / (s**2).sum(axis=1)
    return f, 0.5 * (pc + ps)


def dominant_freq(
    x: np.ndarray, t: np.ndarray, min_f: float = 0.5, max_f: float = 20.0
) -> tuple[float, float]:
    """extractAccelTestV2.m:60-71: band-limited dominant frequency + power."""
    f, p = lomb_scargle(x, t, max_f)
    keep = f > min_f
    f, p = f[keep], p[keep]
    if len(f) == 0:
        return np.nan, np.nan
    i = int(np.argmax(p))
    return float(f[i]), float(p[i])


def fft_dominant_freq(
    x: np.ndarray, min_f: float = 0.01, max_f: float = 0.5
) -> tuple[float, float]:
    """Dominant frequency on a REGULAR unit-step grid via the FFT
    periodogram — O(n log n) equivalent of the Lomb periodogram for
    evenly-sampled input (used for token sequences; the O(n^2) Lomb kernel
    is reserved for genuinely irregular timestamps)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 4:
        return np.nan, np.nan
    xc = x - x.mean()
    p = np.abs(np.fft.rfft(xc)) ** 2 / n
    f = np.arange(len(p)) / n
    keep = (f > min_f) & (f <= max_f)
    if not keep.any():
        return np.nan, np.nan
    fk, pk = f[keep], p[keep]
    i = int(np.argmax(pk))
    return float(fk[i]), float(pk[i])


def cart2sph(x, y, z):
    """MATLAB cart2sph: azimuth, elevation, radius (extractAccelTestV2.m:42)."""
    a = np.arctan2(y, x)
    e = np.arctan2(z, np.hypot(x, y))
    r = np.sqrt(x * x + y * y + z * z)
    return a, e, r


def gravity_reorder(xyz: np.ndarray) -> np.ndarray:
    """extractAccelTestV2.m:28-36: permute the 3 axes by descending
    |mean| — (gravity, walking, z)."""
    m = np.abs(xyz.mean(axis=0))
    order = np.argsort(-m, kind="stable")
    return xyz[:, order]


def rmgravity_mean(xyz: np.ndarray) -> np.ndarray:
    """rmgravity(X, 'mean') — undefined in the reference repo; reconstructed
    as per-axis mean subtraction (the conservative reading of 'mean' mode),
    documented as derived semantics (SURVEY.md §2.9)."""
    return xyz - xyz.mean(axis=0, keepdims=True)


def tap_segments(tsp: np.ndarray, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """extractTapTestV2.m:26-51: alternation state machine around the x
    midpoint, emitting (Tstay, Tmove) duration arrays. Vectorized via
    sign-change indices (same outputs as the sequential loop)."""
    tsp = np.asarray(tsp, dtype=float) - float(tsp[0])
    x = np.asarray(x, dtype=float)
    mid = (x.max() - x.min()) / 2.0 + x.min()
    s = np.sign(x - mid)
    # Reference state-machine semantics (extractTapTestV2.m:29-45), run-based:
    # the machine is UNINITIALIZED while its state sign is 0 — it (re-)inits
    # at the next sample without emitting. A transition from a NONZERO state
    # to a different sign (including 0) emits (Tstay, Tmove). Hence, over
    # maximal equal-sign runs: an emission fires at the start of every run
    # whose PREVIOUS run has nonzero sign; Tstay spans the previous run.
    n = len(s)
    run_starts = np.concatenate([[0], np.where(s[1:] != s[:-1])[0] + 1])
    run_signs = s[run_starts]
    if len(run_starts) < 2:
        return np.array([]), np.array([])
    emit = run_signs[:-1] != 0  # for runs 1..m-1: previous run nonzero?
    c = run_starts[1:][emit]  # emission indices (starts of runs)
    prev_start = run_starts[:-1][emit]
    if len(c) == 0:
        return np.array([]), np.array([])
    return tsp[c - 1] - tsp[prev_start], tsp[c] - tsp[c - 1]


def find_peaks_simple(x: np.ndarray) -> np.ndarray:
    """MATLAB findpeaks default: strict local maxima (both neighbors lower)."""
    x = np.asarray(x, dtype=float)
    if len(x) < 3:
        return np.array([], dtype=np.int64)
    return np.where((x[1:-1] > x[:-2]) & (x[1:-1] > x[2:]))[0] + 1


def pwelch_pitch(data: np.ndarray, fs: float, nfft: int = 512) -> float:
    """getPitch.m: Welch PSD (hamming(NFFT), 50% overlap, NFFT-point FFT),
    strongest peak index → pitch = idx/len(psd)*(fs/2) (1-based idx)."""
    data = np.asarray(data, dtype=float)
    win = np.hamming(nfft)
    step = nfft // 2
    if len(data) < nfft:
        seg = np.zeros(nfft)
        seg[: len(data)] = data
        segs = seg[None, :]
    else:
        n_seg = (len(data) - nfft) // step + 1
        idx = np.arange(nfft)[None, :] + step * np.arange(n_seg)[:, None]
        segs = data[idx]
    segs = (segs - 0.0) * win[None, :]
    spec = np.fft.rfft(segs, n=nfft, axis=1)
    psd = (np.abs(spec) ** 2).mean(axis=0)
    # one-sided scaling (MATLAB pwelch): double non-DC/non-Nyquist bins
    scale = 1.0 / (fs * (win**2).sum())
    psd = psd * scale
    psd[1:-1] *= 2.0
    pk = find_peaks_simple(psd)
    if len(pk) == 0:
        return np.nan
    best = pk[np.argmax(psd[pk])]
    return float((best + 1) / len(psd) * (fs / 2.0))


# ---------------------------------------------------------------- batched
# Same-length batched variants. The scalar kernels above spend 60-120us of
# numpy call overhead PER SCALE per sequence (fastdfa is ~80% of the token
# battery); stacking B same-length sequences into a (B, n) matrix runs the
# identical per-scale formulas once for the whole group. Numerics: every
# reduction uses the same axis-wise pairwise summation as the 1-D path, so
# results match the scalar kernels to <= 1e-12 relative (the final log-log
# slope uses the closed-form OLS instead of np.polyfit's scaled lstsq —
# differential-tested in tests/test_battery_batch.py).


def fastdfa_batch(X: np.ndarray) -> np.ndarray:
    """fastdfa for a (B, n) batch of same-length sequences -> (B,) alphas.

    Mirrors fastdfa_core.c:41-161,255-263 exactly as fastdfa() does: DFA on
    the per-row cumulative sum, binary-subdivision interval widths, closed
    form per-interval linear detrend on absolute indices, tail kept raw.
    """
    X = np.asarray(X, dtype=float)
    B, n = X.shape
    if n < 8:
        return np.full(B, np.nan)
    intervals = _dfa_intervals(n)
    if len(intervals) < 2:
        return np.full(B, np.nan)
    Y = np.cumsum(X, axis=1)
    S = len(intervals)
    flucts = np.empty((B, S), dtype=float)
    for s in range(S):
        m = int(intervals[s])
        k = n // m
        if k > 0:
            xm = Y[:, : k * m].reshape(B, k, m)
            starts = np.arange(k, dtype=float) * m
            ends = starts + m - 1
            j = np.arange(m, dtype=float)
            sy = xm.sum(axis=2)                       # (B, k)
            # einsum instead of (xm * j).sum: same reduction, no (B, k, m)
            # product temporary (the batch is memory-bandwidth-bound)
            sxy = starts * sy + np.einsum("bkm,m->bk", xm, j)  # (B, k)
            sx = (ends + starts) * m / 2.0            # (k,)
            sxx = m * (
                2 * ends**2 + 2 * starts**2 + 2 * starts * ends + ends - starts
            ) / 6.0
            delta = m * sxx - sx * sx
            b = (sy * sxx - sx * sxy) / delta         # (B, k)
            a = (m * sxy - sx * sy) / delta           # (B, k)
            # residual kept in the C transcription's DIRECT form (sum of
            # squared detrended values — no SSE shortcut identity, which
            # cancels catastrophically when resid << sum(y^2)); built in
            # ONE reused buffer + einsum reduce instead of materializing
            # trend / (xm - trend) / square (measured 1.7x at n >= 512)
            xabs = starts[:, None] + j[None, :]       # (k, m)
            r = np.multiply(a[:, :, None], xabs[None, :, :])
            r += b[:, :, None]
            np.subtract(xm, r, out=r)
            resid = np.einsum("bkm,bkm->b", r, r)
        else:
            resid = np.zeros(B)
        flucts[:, s] = np.sqrt(resid / n)
    with np.errstate(divide="ignore"):
        lx = np.log10(intervals.astype(float))        # (S,)
        ly = np.log10(flucts)                         # (B, S)
    ok = np.isfinite(ly)
    w = ok.astype(float)
    cnt = w.sum(axis=1)
    ly0 = np.where(ok, ly, 0.0)
    sx_ = w @ lx
    sy_ = ly0.sum(axis=1)
    sxx_ = w @ (lx * lx)
    sxy_ = ly0 @ lx
    denom = cnt * sxx_ - sx_ * sx_
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (cnt * sxy_ - sx_ * sy_) / denom
    return np.where((cnt >= 2) & (denom != 0), slope, np.nan)


def fft_dominant_freq_batch(
    X: np.ndarray, min_f: float = 0.01, max_f: float = 0.5
) -> tuple[np.ndarray, np.ndarray]:
    """fft_dominant_freq for a (B, n) batch -> ((B,) freqs, (B,) powers)."""
    X = np.asarray(X, dtype=float)
    B, n = X.shape
    if n < 4:
        return np.full(B, np.nan), np.full(B, np.nan)
    xc = X - X.mean(axis=1)[:, None]
    p = np.abs(np.fft.rfft(xc, axis=1)) ** 2 / n      # (B, F)
    f = np.arange(p.shape[1]) / n
    keep = (f > min_f) & (f <= max_f)
    if not keep.any():
        return np.full(B, np.nan), np.full(B, np.nan)
    fk, pk = f[keep], p[:, keep]
    i = np.argmax(pk, axis=1)
    rows = np.arange(B)
    return fk[i], pk[rows, i]
