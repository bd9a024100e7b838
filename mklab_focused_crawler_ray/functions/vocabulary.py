"""Vocabulary / IDF / IDF-shift math for windowed event detection.

Faithful port of the reference math:
- DF accumulation and IDF = log10(N / df)  (utils/Vocabulary.java:50-70)
- shift = (idf_prev - idf_cur) / idf_cur   (utils/Vocabulary.java:90-107)
- candidate-event rule over the last ``windows`` snapshots: a token is a
  candidate iff it appears in ALL previous windows with monotonically
  non-increasing IDF and non-decreasing IDF-shift
  (bolts/items/EventDetectionBolt.java:102-141; defaults windows=5,
  windowLength=60 s — SocialMediaMonitor.java:110).

Here a "window" is a small pandas/numpy table ``token → df`` plus the window
document count N; snapshots are a bounded FIFO (utils/Snapshots.java:14-23).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def idf(df_counts: pd.Series, n_docs: int) -> pd.Series:
    """log10(N / df) — Vocabulary.java:68."""
    return np.log10(n_docs / df_counts.astype(np.float64))


def idf_shift(idf_prev: pd.Series, idf_cur: pd.Series) -> pd.Series:
    """(idf_prev - idf_cur)/idf_cur over the token intersection —
    Vocabulary.java:90-107 (getShift computes over shared keys only)."""
    common = idf_prev.index.intersection(idf_cur.index)
    prev = idf_prev.loc[common]
    cur = idf_cur.loc[common]
    return (prev - cur) / cur


def candidate_events(window_idfs: list[pd.Series]) -> list[str]:
    """Tokens present in every window of ``window_idfs`` (oldest→newest) whose
    IDF is non-increasing across consecutive windows and whose IDF-shift is
    non-decreasing — EventDetectionBolt.java:102-141.

    Expects the full snapshot list (length = configured ``windows``); returns
    sorted candidate tokens.
    """
    if len(window_idfs) < 2:
        return []
    common = window_idfs[0].index
    for w in window_idfs[1:]:
        common = common.intersection(w.index)
    if len(common) == 0:
        return []
    mat = np.stack([w.loc[common].to_numpy(dtype=np.float64) for w in window_idfs])
    # non-increasing IDF across consecutive windows
    nonincr = np.all(mat[1:] <= mat[:-1], axis=0)
    # shifts between consecutive windows, non-decreasing
    shifts = (mat[:-1] - mat[1:]) / mat[1:]
    if shifts.shape[0] >= 2:
        shift_ok = np.all(shifts[1:] >= shifts[:-1], axis=0)
    else:
        shift_ok = np.ones(len(common), dtype=bool)
    ok = nonincr & shift_ok
    return sorted(np.asarray(common)[ok].tolist())
