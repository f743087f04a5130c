"""Pure-python/numpy oracles transcribed line-for-line from the reference
(dssl/mimicUsefulFunction.R, dssl/dssFunctionLibrary.R). These are the
ground truth the Spark operators are differentially tested against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def time_since_to_event(id_, ht, event):
    """mimicUsefulFunction.R:23-94 (dss.Auxiliary.CalculateTimeSinceAndToEvent)."""
    n = len(event)
    t_next = np.full(n, np.nan)
    t_first_to = np.full(n, np.nan)
    t_since_last = np.full(n, np.nan)
    t_since_first = np.full(n, np.nan)

    last_id = None
    last_ev = np.nan
    first_ev = np.nan
    for i in range(n):
        if last_id is None or id_[i] != last_id:
            last_id = id_[i]
            last_ev = np.nan
            first_ev = np.nan
        if not np.isnan(last_ev) or not np.isnan(first_ev):
            t_since_last[i] = ht[i] - last_ev
            t_since_first[i] = ht[i] - first_ev
        if event[i] == 1:
            last_ev = ht[i]
            if np.isnan(first_ev):
                first_ev = ht[i]
    last_id = None
    last_ev = np.nan
    for i in range(n - 1, -1, -1):
        if last_id is None or id_[i] != last_id:
            last_id = id_[i]
            last_ev = np.nan
        if not np.isnan(last_ev):
            t_next[i] = last_ev - ht[i]
        if event[i] == 1:
            last_ev = ht[i]
    cond = ~np.isnan(t_next) & np.isnan(t_since_first)
    t_first_to[cond] = t_next[cond]
    return t_next, t_first_to, t_since_last, t_since_first


def locf_with_expiration(id_, ht, vec, valid_time):
    """mimicUsefulFunction.R:301-332 (per-id LOCF + time-since + expiration)."""
    n = len(vec)
    locf = np.full(n, np.nan)
    tsls = np.full(n, np.nan)
    last_val = np.nan
    last_t = np.nan
    last_id = None
    for i in range(n):
        if last_id is None or id_[i] != last_id:
            last_id = id_[i]
            last_val = np.nan
            last_t = np.nan
        if not np.isnan(vec[i]):
            last_val = vec[i]
            last_t = ht[i]
        locf[i] = last_val
        tsls[i] = ht[i] - last_t if not np.isnan(last_t) else np.nan
    expir = locf.copy()
    cond = ~np.isnan(tsls) & (tsls > valid_time)
    expir[cond] = np.nan
    return locf, tsls, expir


def remove_short_on_intervals(id_, ht, vec, time_th):
    """mimicUsefulFunction.R:384-436 — literal transcription of the loop."""
    n = len(ht)
    is_last = np.append(np.array(id_[1:]) != np.array(id_[:-1]), True)
    sig = np.nan_to_num(np.asarray(vec, dtype=float), nan=0.0)
    out = np.zeros(n, dtype=int)
    prev_val = -1
    prev_t = -time_th - 1 + time_th  # R: -timeTh - 1 + min(timeTh)
    rise_t = -time_th - 1
    rise_i = -1
    for i in range(n):
        cur_t = ht[i]
        cur = sig[i]
        if cur == 1 and prev_val <= 0:
            rise_t = ht[i]
            rise_i = i
        if cur == 0 and prev_val == 1:
            if prev_t - rise_t >= time_th:
                out[rise_i:i] = 1
        if cur == 1 and prev_val == 1 and is_last[i]:
            if cur_t - rise_t >= time_th:
                out[rise_i : i + 1] = 1
        if is_last[i]:
            prev_val = -1
            prev_t = -time_th - 1
        else:
            prev_val = cur
            prev_t = cur_t
    return out


def unite_adjacent_on_intervals(id_, ht, vec, union_th):
    """mimicUsefulFunction.R:449-494 — literal transcription of the loop."""
    n = len(ht)
    is_last = np.append(np.array(id_[1:]) != np.array(id_[:-1]), True)
    sig = np.nan_to_num(np.asarray(vec, dtype=float), nan=0.0).astype(int)
    ht = np.asarray(ht, dtype=float).copy()
    ht[ht < 0] = 0
    prev_val = -1
    prev_t = -1.0
    fall_t = -union_th - 1
    fall_i = -1
    for i in range(n):
        cur_t = ht[i]
        cur = sig[i]
        if prev_val == 0 and cur == 1:
            if cur_t - fall_t <= union_th:
                sig[fall_i : i + 1] = 1
        if prev_val == 1 and cur == 0:
            fall_t = prev_t
            fall_i = i - 1
        if is_last[i]:
            prev_val = -1
            prev_t = -1.0
            fall_t = -union_th - 1
            fall_i = -1
        else:
            prev_val = cur
            prev_t = cur_t
    return sig


def time_weighted_average(val, ht):
    """dssFunctionLibrary.R:1350-1368."""
    val = np.asarray(val, dtype=float)
    ht = np.asarray(ht, dtype=float)
    if len(val) == 1:
        return val[0]
    dv = np.diff(val) / 2.0
    dht = np.diff(ht)
    return float(np.sum((val[:-1] + dv) * dht) / np.sum(dht))


def response_to_treatment(id_, ht, dss, treat_idx, wind, pre_post=False):
    """dssFunctionLibrary.R:1419-1503 (plain + PrePost two-pointer loops)."""
    rows = []
    n = len(ht)
    for ci in treat_idx:
        cur_t = ht[ci]
        cur_id = id_[ci]
        fwd = ci
        while fwd < n - 1 and (ht[fwd + 1] - cur_t <= wind) and id_[fwd + 1] == cur_id:
            fwd += 1
        if not pre_post:
            if fwd > ci:
                rows.append(
                    dict(
                        num_before=1,
                        num_after=fwd - ci + 1,
                        avg_before=dss[ci],
                        avg_after=time_weighted_average(
                            dss[ci : fwd + 1], ht[ci : fwd + 1]
                        ),
                    )
                )
            else:
                rows.append(
                    dict(
                        num_before=np.nan,
                        num_after=np.nan,
                        avg_before=np.nan,
                        avg_after=np.nan,
                    )
                )
            continue
        bck = ci
        while bck > 0 and (cur_t - ht[bck - 1] <= wind) and id_[bck - 1] == cur_id:
            bck -= 1
        if fwd > ci and bck < ci:
            avg_b = time_weighted_average(dss[bck : ci + 1], ht[bck : ci + 1])
            avg_a = time_weighted_average(dss[ci : fwd + 1], ht[ci : fwd + 1])
            rows.append(
                dict(
                    num_before=ci - bck + 1,
                    num_after=fwd - ci,
                    avg_before=avg_b,
                    avg_after=avg_a,
                    avg_now=dss[ci],
                    trend_before=dss[ci] - avg_b,
                    trend_after=avg_a - dss[ci],
                )
            )
        else:
            rows.append(
                dict(
                    num_before=np.nan,
                    num_after=np.nan,
                    avg_before=np.nan,
                    avg_after=np.nan,
                    avg_now=np.nan,
                    trend_before=np.nan,
                    trend_after=np.nan,
                )
            )
    return pd.DataFrame(rows)


def derived_features(pdf, value="dss", ts="ht"):
    """dssFunctionLibrary.R:876-917 (extractDSSFeaturesForEachPatient) for
    ONE entity's time-ordered frame."""
    ht = pdf[ts].to_numpy(dtype=float)
    dss = pdf[value].to_numpy(dtype=float)
    n = len(ht)
    line = np.arange(1, n + 1)
    cs = np.cumsum
    cumsum_ht = cs(ht)
    cumsum_ht_sq = cs(ht**2)
    abs_diff = np.concatenate([[0], np.abs(np.diff(dss))])
    diff_ht = np.concatenate([[1], np.abs(np.diff(ht))])
    abs_rate = abs_diff / diff_ht
    sgn_diff = np.concatenate([[0], np.diff(dss)])
    rate = sgn_diff / diff_ht
    out = pd.DataFrame(
        {
            "dss_avg": cs(dss) / line,
            "dss_ht_avg": cs(dss * ht) / cumsum_ht,
            "dss_ht_sq_avg": cs(dss * ht**2) / cumsum_ht_sq,
            "dss_max": np.maximum.accumulate(dss),
            "dss_min": np.minimum.accumulate(dss),
            "dss_rate_avg": cs(rate) / line,
            "dss_rate_ht_avg": cs(rate * ht) / cumsum_ht,
            "dss_abs_rate_avg": cs(abs_rate) / line,
            "dss_abs_rate_ht_avg": cs(abs_rate * ht) / cumsum_ht,
        }
    )
    # R: res_df[is.na(res_df)] = 0 (NaN → 0, Inf preserved)
    return out.fillna(0.0)


def interpolate_single(x, y, def_val):
    """mimicUsefulFunction.R:669-708 for one entity."""
    y = np.asarray(y, dtype=float).copy()
    x = np.asarray(x, dtype=float)
    non_na = ~np.isnan(y)
    if non_na.all():
        return y
    if not non_na.any():
        return np.full_like(y, def_val)
    if np.isnan(y[-1]):
        y[-1] = y[non_na][-1]
    if np.isnan(y[0]):
        y[0] = def_val
    idx = np.where(~np.isnan(y))[0]
    out = y.copy()
    for i in range(len(y)):
        if np.isnan(y[i]):
            p = idx[idx < i][-1]
            q = idx[idx > i][0]
            out[i] = (y[q] * (x[i] - x[p]) + y[p] * (x[q] - x[i])) / (x[q] - x[p])
    return out


def fastdfa_loop(x):
    """Literal double-loop transcription of fastdfa_core.c:41-161 + fastdfa.m
    — the independent oracle for the vectorized kernel."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    # cumulativeSum (fastdfa_core.c:214)
    y = np.cumsum(x)
    # scales (fastdfa_core.c:257-263)
    n_scales = int(np.log10(n) / np.log10(2.0))
    if float(1 << (n_scales - 1)) > n / 2.5:
        n_scales -= 1
    intervals = np.zeros(n_scales, dtype=np.int64)
    for scale in range(n_scales - 1, -1, -1):
        subdivs = 1 << scale
        intervals[scale] = int(n / subdivs + 0.5)
    flucts = np.zeros(n_scales)
    for scale in range(n_scales - 1, -1, -1):
        trend = np.zeros(n)
        m = int(intervals[scale])
        idx = 0
        while idx < n:
            start = idx
            end = idx + m - 1
            if end >= n:
                for i in range(start, n):
                    trend[i] = y[i]
                break
            iw = end - start + 1
            sy = 0.0
            sxy = 0.0
            for i in range(start, end + 1):
                sy += y[i]
                sxy += y[i] * float(i)
            sx = (end + start) * iw / 2.0
            sxx = iw * (2.0 * end * end + 2.0 * start * start
                        + 2.0 * start * end + end - start) / 6.0
            delta = iw * sxx - sx * sx
            b = (sy * sxx - sx * sxy) / delta
            a = (iw * sxy - sx * sy) / delta
            for i in range(start, end + 1):
                trend[i] = a * i + b
            idx += m
        accum = float(((y - trend) ** 2).sum())
        flucts[scale] = np.sqrt(accum / n)
    coeffs = np.polyfit(np.log10(intervals.astype(float)), np.log10(flucts), 1)
    return float(coeffs[0])


def tap_segments_loop(tsp, x):
    """Literal transcription of extractTapTestV2.m:26-51."""
    tsp = np.asarray(tsp, dtype=float) - float(tsp[0])
    x = np.asarray(x, dtype=float)
    mid = (x.max() - x.min()) / 2.0 + x.min()
    s = 0.0
    start = 0.0
    prev = 0.0
    t_stay, t_move = [], []
    for i in range(len(x)):
        if s == 0:
            s = np.sign(x[i] - mid)
            start = tsp[i]
        else:
            new_sign = np.sign(x[i] - mid)
            if new_sign != s:
                t_stay.append(prev - start)
                t_move.append(tsp[i] - prev)
                start = tsp[i]
                s = new_sign
        prev = tsp[i]
    return np.array(t_stay), np.array(t_move)


def reaction_lags_loop(tsp, v, p):
    """Literal transcription of extractReactTestV1.m:27-47."""
    lags = []
    mismatch = False
    start = 0.0
    for i in range(len(tsp)):
        if mismatch:
            if v[i] == p[i]:
                lags.append(tsp[i] - start)
                mismatch = False
        elif v[i] != p[i]:
            mismatch = True
            start = tsp[i]
    return np.array(lags)
