"""VocabTracker: streaming event detection with checkpoint/restore must
produce the identical candidate stream as an uninterrupted run, and match
the batch items_event_candidates pipeline on the same fixture."""

from __future__ import annotations

import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from mklab_focused_crawler_ray.stages.nlp import tokens_for_mode
from mklab_focused_crawler_ray.state.vocab_tracker import VocabTracker


def _windows_from_items(items_parquet: str, window_s: int = 60):
    t = pq.read_table(items_parquet, columns=["title", "ts"])
    ts_ms = t["ts"].cast("int64").to_numpy()  # fixture is timestamp[ms]
    win = ts_ms // (window_s * 1000)
    per: dict[int, tuple[Counter, int]] = {}
    for w, title in zip(win, t["title"].to_pylist()):
        c, n = per.setdefault(int(w), (Counter(), 0))
        for tok in set(tokens_for_mode(title)):
            c[tok] += 1
        per[int(w)] = (c, n + 1)
    return sorted(per.items())


@pytest.fixture(scope="module")
def small_items():
    from mklab_focused_crawler_ray.fixtures.generate import generate_tier

    d = generate_tier("small", "/tmp/mkfc_fixtures/small")
    return os.path.join(d, "items.parquet")


def test_streaming_equals_batch_pipeline(ray_session, small_items):
    from mklab_focused_crawler_ray.stages.nlp import items_event_candidates

    batch = items_event_candidates(small_items).to_pandas()
    expected = set(zip(batch["window"], batch["token"]))

    tracker = VocabTracker(windows=5)
    got = set()
    for w, (counts, n_docs) in _windows_from_items(small_items):
        for tok in tracker.feed(w, dict(counts), n_docs):
            got.add((w, tok))
    assert got == expected
    assert got, "fixture plants a detectable event"


def test_checkpoint_restore_identical_stream(small_items):
    windows = _windows_from_items(small_items)
    full = VocabTracker(windows=5)
    full_out = [
        (w, tuple(full.feed(w, dict(c), n))) for w, (c, n) in windows
    ]

    half = len(windows) // 2
    a = VocabTracker(windows=5)
    first = [(w, tuple(a.feed(w, dict(c), n))) for w, (c, n) in windows[:half]]
    b = VocabTracker.from_json(a.to_json())  # process restart
    second = [(w, tuple(b.feed(w, dict(c), n))) for w, (c, n) in windows[half:]]
    assert first + second == full_out


def test_out_of_order_window_rejected():
    t = VocabTracker(windows=3)
    t.feed(5, {"a": 1}, 2)
    with pytest.raises(ValueError):
        t.feed(5, {"a": 1}, 2)
    with pytest.raises(ValueError):
        t.feed(4, {"a": 1}, 2)
