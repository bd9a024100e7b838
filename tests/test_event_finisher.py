"""candidate_events_dataset (token-bucketed distributed finisher) must be
float-for-float equal to the sequential snapshot-FIFO replay built on
functions.vocabulary.candidate_events — the r4 'Next round' #3 flip from a
driver-side (window, token) frame to map_groups."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _sequential(counts: pd.DataFrame, windows: int) -> set[tuple[int, str]]:
    """The pre-r5 driver-side finisher, verbatim semantics."""
    from mklab_focused_crawler_ray.functions.vocabulary import (
        candidate_events,
        idf,
    )
    from mklab_focused_crawler_ray.stages.nlp import NDOCS_SENTINEL

    ndocs = (
        counts[counts["token"] == NDOCS_SENTINEL]
        .set_index("window")["df"]
        .to_dict()
    )
    counts = counts[counts["token"] != NDOCS_SENTINEL]
    snapshots: list[pd.Series] = []
    out = set()
    for w in sorted(ndocs):
        sub = counts[counts["window"] == w]
        snapshots.append(idf(sub.set_index("token")["df"], int(ndocs[w])))
        if len(snapshots) > windows:
            snapshots.pop(0)
        if len(snapshots) == windows:
            for tok in candidate_events(snapshots):
                out.add((int(w), tok))
    return out


def _counts_frame(seed: int, n_windows: int, vocab: int) -> pd.DataFrame:
    """Random (window, token, df) counts with planted monotone tokens."""
    from mklab_focused_crawler_ray.stages.nlp import NDOCS_SENTINEL

    rng = np.random.default_rng(seed)
    rows = []
    nd = rng.integers(20, 60, n_windows)
    for w in range(n_windows):
        rows.append((w, NDOCS_SENTINEL, int(nd[w])))
        for t in range(vocab):
            df = int(rng.integers(0, 6))
            if df > 0:
                rows.append((w, f"t{t:03d}", min(df, int(nd[w]))))
    return pd.DataFrame(rows, columns=["window", "token", "df"])


@pytest.mark.parametrize("seed,n_windows,vocab", [(1, 8, 30), (7, 12, 50), (3, 4, 10)])
def test_distributed_finisher_equals_sequential(ray_session, seed, n_windows, vocab):
    import ray.data as rd

    from mklab_focused_crawler_ray.stages.nlp import candidate_events_dataset

    counts = _counts_frame(seed, n_windows, vocab)
    ds = rd.from_arrow(pa.Table.from_pandas(counts, preserve_index=False))
    got = {
        (int(r["window"]), r["token"])
        for _, r in candidate_events_dataset(ds, windows=5).to_pandas().iterrows()
    }
    want = _sequential(counts, windows=5)
    assert got == want


def test_planted_event_detected(ray_session):
    """Deterministic planted event: constant N, doubling df → IDF strictly
    decreasing, IDF-shift strictly increasing → candidate at every window
    once the FIFO fills. Both finishers must flag exactly those."""
    import ray.data as rd

    from mklab_focused_crawler_ray.stages.nlp import (
        NDOCS_SENTINEL,
        candidate_events_dataset,
    )

    rows = []
    for w in range(6):
        rows.append((w, NDOCS_SENTINEL, 1000))
        rows.append((w, "planted", 10 * 2**w))  # 10,20,...,320
        rows.append((w, "noise", 7 + 2 * (w % 2)))  # alternating df → IDF
        # rises on odd windows → fails the non-increasing requirement
    counts = pd.DataFrame(rows, columns=["window", "token", "df"])
    ds = rd.from_arrow(pa.Table.from_pandas(counts, preserve_index=False))
    got = {
        (int(r["window"]), r["token"])
        for _, r in candidate_events_dataset(ds, windows=5).to_pandas().iterrows()
    }
    assert got == {(4, "planted"), (5, "planted")}
    assert got == _sequential(counts, windows=5)


def test_finisher_empty_and_short_inputs(ray_session):
    import ray.data as rd

    from mklab_focused_crawler_ray.stages.nlp import (
        NDOCS_SENTINEL,
        candidate_events_dataset,
    )

    # fewer windows than the FIFO length → no candidates
    counts = _counts_frame(5, 3, 10)
    ds = rd.from_arrow(pa.Table.from_pandas(counts, preserve_index=False))
    assert candidate_events_dataset(ds, windows=5).count() == 0
