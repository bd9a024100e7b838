"""Edge-semantics tests for the round-3 training-data operators:
sessionization boundaries (gap strictly > 30 min splits; ties ordered by
event_id), chunking window arithmetic, and connected-component transitivity
of the fuzzy-dedup canonicalizer. The full-query oracle equivalence runs in
tests/test_queries_oracle.py; these pin the hand-reasoned corner cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sessionize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Run the query's per-bucket kernel directly on one frame."""
    from mklab_focused_crawler_ray.pipelines.queries import (
        SESSION_GAP_MS,
        q_user_sessions,
    )

    # reach the inner kernel through the module-level constants it uses
    assert SESSION_GAP_MS == 1_800_000
    # re-implementation shortcut: call the query over a temp parquet
    import tempfile

    import pyarrow.parquet as pq
    import ray

    with tempfile.TemporaryDirectory() as d:
        t = pa.table(
            {
                "event_id": pa.array(df["event_id"], pa.int64()),
                "ts": pa.array(df["ms"].astype("int64"), pa.int64()).cast(
                    pa.timestamp("ms")
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(df["user_id"], pa.int64()),
                "event_type": pa.array(["x"] * len(df), pa.string()),
                "value": pa.array([0.0] * len(df), pa.float64()),
                "props": pa.array(["{}"] * len(df), pa.string()),
            }
        )
        pq.write_table(t, f"{d}/events.parquet")
        res = q_user_sessions(d)
        out = res.to_pandas() if isinstance(res, ray.data.Dataset) else res
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


def test_session_gap_boundary(ray_session):
    G = 1_800_000
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [7, 7, 7, 7],
            # gaps: exactly G (same session), G+1 (split), 1 (same)
            "ms": [1_000, 1_000 + G, 1_000 + 2 * G + 1, 1_000 + 2 * G + 2],
        }
    )
    out = _sessionize_frame(df)
    assert out["session_idx"].tolist() == [0, 1]
    assert out["n_events"].tolist() == [2, 2]
    assert out["start_ms"].tolist() == [1_000, 1_000 + 2 * G + 1]
    assert out["end_ms"].tolist() == [1_000 + G, 1_000 + 2 * G + 2]


def test_session_users_independent(ray_session):
    # interleaved users never share sessions even at identical timestamps
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [1, 2, 1, 2],
            "ms": [5_000, 5_000, 6_000, 6_000],
        }
    )
    out = _sessionize_frame(df)
    assert len(out) == 2
    assert set(out["user_id"]) == {1, 2}
    assert out["n_events"].tolist() == [2, 2]


def test_chunk_window_arithmetic():
    from mklab_focused_crawler_ray.pipelines.queries import CHUNK_W

    # n = 2*W + 1 tokens → 3 chunks sized (W, W, 1)
    n = 2 * CHUNK_W + 1
    sizes = [
        min(CHUNK_W, n - i * CHUNK_W) for i in range((n + CHUNK_W - 1) // CHUNK_W)
    ]
    assert sizes == [CHUNK_W, CHUNK_W, 1]


def test_cc_min_label_transitive():
    """The production CC kernel must assign one rep per connected component:
    chain, star, and two disjoint comps, regardless of edge order."""
    from mklab_focused_crawler_ray.pipelines.queries import cc_min_label

    a = np.array([10, 20, 50, 41, 40], np.int64)  # edges: 10-20,20-30,50-40,41-42,40-41
    b = np.array([20, 30, 40, 42, 41], np.int64)
    nodes, labels = cc_min_label(a, b)
    rep = dict(zip(nodes.tolist(), labels.tolist()))
    assert rep[10] == rep[20] == rep[30] == 10
    assert rep[40] == rep[41] == rep[42] == rep[50] == 40


# ---------------------------------------------------------------------------
# property tests vs pure-python references
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _sessions_reference(rows, gap):
    """Dict-of-lists reference sessionizer: per user sort by (ms, event_id),
    split at gaps > gap."""
    by_user = {}
    for eid, uid, ms in rows:
        by_user.setdefault(uid, []).append((ms, eid))
    out = []
    for uid in sorted(by_user):
        evs = sorted(by_user[uid])
        sess, sidx = [evs[0]], 0
        for prev, cur in zip(evs, evs[1:]):
            if cur[0] - prev[0] > gap:
                out.append((uid, sidx, len(sess), sess[0][0], sess[-1][0]))
                sess, sidx = [], sidx + 1
            sess.append(cur)
        out.append((uid, sidx, len(sess), sess[0][0], sess[-1][0]))
    return sorted(out)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 7),  # user_id
            st.integers(0, 10_000_000),  # ms
        ),
        min_size=1,
        max_size=60,
    )
)
def test_sessionize_matches_reference(ray_session, pairs):
    import pandas as pd

    rows = [(i, uid, ms) for i, (uid, ms) in enumerate(pairs)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ms"])
    out = _sessionize_frame(df)
    got = sorted(
        zip(
            out["user_id"], out["session_idx"], out["n_events"],
            out["start_ms"], out["end_ms"],
        )
    )
    assert got == _sessions_reference(rows, 1_800_000)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=40))
def test_cc_matches_bfs(edges):
    """The production CC kernel == BFS component minima on random graphs."""
    from mklab_focused_crawler_ray.pipelines.queries import cc_min_label

    if not edges:
        return
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    nodes, labels = cc_min_label(a, b)
    # BFS reference
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    ref = {}
    for start in sorted(adj):
        if start in ref:
            continue
        comp, todo = set(), [start]
        while todo:
            v = todo.pop()
            if v in comp:
                continue
            comp.add(v)
            todo.extend(adj[v] - comp)
        m = min(comp)
        for v in comp:
            ref[v] = m
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == ref


@settings(max_examples=25, deadline=None)
@given(st.text(max_size=400))
def test_chunks_reassemble_token_stream(text):
    """Concatenating a doc's chunks in chunk_idx order reproduces its
    token stream exactly — no token lost or duplicated."""
    from mklab_focused_crawler_ray.pipelines.queries import CHUNK_W, TOKEN_RE

    tk = TOKEN_RE.findall(text.lower())
    chunks = [
        tk[i * CHUNK_W : (i + 1) * CHUNK_W]
        for i in range((len(tk) + CHUNK_W - 1) // CHUNK_W)
    ]
    flat = [t for c in chunks for t in c]
    assert flat == tk
    assert all(0 < len(c) <= CHUNK_W for c in chunks)


def _asof_frame(df):
    """Run the as-of query over a temp events parquet, mirroring
    _sessionize_frame."""
    import tempfile

    import pyarrow.parquet as pq
    import ray

    from mklab_focused_crawler_ray.pipelines.queries import q_events_asof_click

    with tempfile.TemporaryDirectory() as d:
        t = pa.table(
            {
                "event_id": pa.array(df["event_id"], pa.int64()),
                "ts": pa.array(df["ms"].astype("int64"), pa.int64()).cast(
                    pa.timestamp("ms")
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(df["user_id"], pa.int64()),
                "event_type": pa.array(df["event_type"], pa.string()),
                "value": pa.array([0.0] * len(df), pa.float64()),
                "props": pa.array(["{}"] * len(df), pa.string()),
            }
        )
        pq.write_table(t, f"{d}/events.parquet")
        res = q_events_asof_click(d)
        out = res.to_pandas() if isinstance(res, ray.data.Dataset) else res
    cols = ["event_id", "user_id", "prior_click_id", "gap_ms"]
    if out.empty:  # Ray drops the schema when every group's output is empty
        out = out.reindex(columns=cols)
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),  # user_id
            st.integers(0, 1_000),  # ms (small range → many ties)
            st.booleans(),  # is the row a 'click'?
        ),
        min_size=1,
        max_size=50,
    )
)
def test_asof_matches_reference(ray_session, rows):
    import pandas as pd

    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "ms": [r[1] for r in rows],
            "event_type": ["click" if r[2] else "view" for r in rows],
        }
    )
    out = _asof_frame(df)
    got = sorted(
        zip(out["event_id"], out["user_id"], out["prior_click_id"], out["gap_ms"])
    )
    # reference: per user, walk rows in (ms, event_id) order tracking the
    # last click seen strictly before the current row
    ref = []
    for uid in sorted(set(df["user_id"])):
        sub = sorted(
            (ms, eid, et)
            for eid, u, ms, et in zip(
                df["event_id"], df["user_id"], df["ms"], df["event_type"]
            )
            if u == uid
        )
        last = None
        for ms, eid, et in sub:
            if last is not None:
                ref.append((eid, uid, last[1], ms - last[0]))
            if et == "click":
                last = (ms, eid)
    assert got == sorted(ref)
