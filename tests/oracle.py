"""Self-contained pandas oracle.

Faithful reimplementation of the reference's semantics (NOT its code):
* sign-folded Cantor pairing and inverse — rule of CommonCode.py:80-131
* rect grid geometry + affine cell assignment —
  Test/GeoFeatureGenerationClass.py:145-263
* state-change sessionization with >= duration threshold and dropped final
  episode — Test/GeoFeatureGenerationClass.py:394-412
* pandas-convention time features — AttachFeature.py:185-211
* pad-to-multiple sequence reshape — DP_GenerateTrajectory.py:33-93
* backward as-of semantics (generalization target of the north rule)

Used by tests to generate goldens; the Spark engine must match allclose /
byte-equal. Everything is plain pandas/numpy so the oracle shares no code
with the engine under test.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


# --- Cantor ---------------------------------------------------------------

def fold(x: int) -> int:
    return 2 * x if x >= 0 else -2 * x - 1


def unfold(x: int) -> int:
    return x // 2 if x % 2 == 0 else -(x + 1) // 2


def cantor_pair(x: int, y: int) -> int:
    fx, fy = fold(x), fold(y)
    return (fx + fy) * (fx + fy + 1) // 2 + fy


def cantor_unpair(z: int) -> tuple[int, int]:
    w = int((math.isqrt(8 * z + 1) - 1) // 2)
    t = w * (w + 1) // 2
    fy = z - t
    fx = w - fy
    return unfold(fx), unfold(fy)


# --- grid geometry ---------------------------------------------------------

def area_to_params(bounds, accuracy=1000.0):
    lon1, lat1, lon2, lat2 = bounds
    deltalon = accuracy * 360 / (2 * math.pi * 6371004 * math.cos((lat1 + lat2) * math.pi / 360))
    deltalat = accuracy * 360 / (2 * math.pi * 6371004)
    return {"slon": lon1, "slat": lat1, "deltalon": deltalon, "deltalat": deltalat}


def gps_to_cols(lon, lat, params):
    loncol = math.floor((lon - params["slon"] + params["deltalon"] / 2) / params["deltalon"])
    latcol = math.floor((lat - params["slat"] + params["deltalat"] / 2) / params["deltalat"])
    return loncol, latcol


# --- sessionization ---------------------------------------------------------

def sessionize_state_change(
    pdf: pd.DataFrame,
    entity_cols: list[str],
    time_col: str,
    state_col: str,
    min_duration_s: float | None = None,
) -> pd.DataFrame:
    """One row per state-run with stime/etime/duration/n_rows/stay_seq; the
    last run of each entity is dropped; duration filter is >=."""
    rows = []
    for key, g in pdf.sort_values(list(entity_cols) + [time_col]).groupby(entity_cols, sort=True):
        if not isinstance(key, tuple):
            key = (key,)
        g = g.reset_index(drop=True)
        runs = []
        start = 0
        for i in range(1, len(g) + 1):
            if i == len(g) or g.loc[i, state_col] != g.loc[start, state_col]:
                runs.append((start, i))
                start = i
        for ri, (s, e) in enumerate(runs):
            if ri == len(runs) - 1:
                continue  # unobserved end
            stime = g.loc[s, time_col]
            etime = g.loc[runs[ri + 1][0], time_col]
            dur = (etime - stime).total_seconds()
            rows.append(
                dict(
                    zip(entity_cols, key),
                    stime=stime,
                    etime=etime,
                    duration_s=float(dur),
                    n_rows=e - s,
                    stay_seq=ri + 1,
                    **{state_col: g.loc[s, state_col]},
                )
            )
    out = pd.DataFrame(rows)
    if min_duration_s is not None and len(out):
        out = out[out["duration_s"] >= min_duration_s].reset_index(drop=True)
    return out


def sessionize_gap(
    pdf: pd.DataFrame, entity_cols: list[str], time_col: str, gap_s: float
) -> pd.DataFrame:
    rows = []
    for key, g in pdf.sort_values(list(entity_cols) + [time_col]).groupby(entity_cols, sort=True):
        if not isinstance(key, tuple):
            key = (key,)
        g = g.reset_index(drop=True)
        sid = 0
        bounds = []
        prev = None
        for i in range(len(g)):
            t = g.loc[i, time_col]
            if prev is None or (t - prev).total_seconds() > gap_s:
                sid += 1
                bounds.append([i, i])
            else:
                bounds[-1][1] = i
            prev = t
        for k, (s, e) in enumerate(bounds, start=1):
            stime, etime = g.loc[s, time_col], g.loc[e, time_col]
            rows.append(
                dict(
                    zip(entity_cols, key),
                    session_id=k,
                    stime=stime,
                    etime=etime,
                    n_events=e - s + 1,
                    duration_s=float((etime - stime).total_seconds()),
                )
            )
    return pd.DataFrame(rows)


# --- as-of join --------------------------------------------------------------

def asof_join(
    left: pd.DataFrame,
    right: pd.DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> pd.DataFrame:
    """Backward inclusive as-of per key — row-by-row definition (deliberately
    naive: this IS the spec the distributed version must match)."""
    out = left.copy()
    for c in value_cols:
        out[c] = None
    r_by_key = {
        (k if isinstance(k, tuple) else (k,)): g.sort_values(right_time)
        for k, g in right.groupby(on, sort=False)
    }
    for idx, row in left.iterrows():
        k = tuple(row[c] for c in on)
        g = r_by_key.get(k)
        if g is None:
            continue
        elig = g[g[right_time] <= row[left_time]]
        if len(elig):
            last = elig.iloc[-1]
            for c in value_cols:
                out.loc[idx, c] = last[c]
    return out


# --- time features ------------------------------------------------------------

def time_features(pdf: pd.DataFrame, ts_col: str) -> pd.DataFrame:
    ts = pd.to_datetime(pdf[ts_col])
    out = pdf.copy()
    out["weekofyear"] = ts.dt.isocalendar().week.astype(int)
    out["dayofweek"] = ts.dt.dayofweek.astype(int)  # Mon=0 pandas convention
    out["dayofyear"] = ts.dt.dayofyear.astype(int)
    out["quarter"] = ts.dt.quarter.astype(int)
    out["month"] = ts.dt.month.astype(int)
    out["hour"] = ts.dt.hour.astype(int)
    return out


# --- sequence pad/reshape -------------------------------------------------------

def pad_reshape(tokens: list[int], seq_len: int, pad: int = 0) -> np.ndarray:
    """DP_GenerateTrajectory.py:33-41 + :82-93 semantics: pad with 0 to a
    multiple of seq_len (min one block), reshape (n, seq_len)."""
    n = len(tokens)
    blocks = max(1, math.ceil(n / seq_len))
    arr = np.full(blocks * seq_len, pad, dtype=np.int32)
    arr[:n] = np.asarray(tokens, dtype=np.int32)
    return arr.reshape(blocks, seq_len)
