"""StreamUser enrichment path: MediaExtractionBolt.java:181-190 (lookup or
drop) and MediaUpdaterBolt.java:94-125 (first-wins side-table insert —
covered end-to-end by the media_stream_users oracle in
tests/test_queries_oracle.py; here the insert-set semantics get a planted
non-trivial case)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mklab_focused_crawler_ray.functions.platforms import Retriever


def test_resolve_user_passthrough_when_user_present():
    r = Retriever()
    item = {"media_id": "m1", "user": {"id": "u9"}, "user_id": "u9"}
    assert r.resolve_user("youtube", item) is item


def test_resolve_user_lookup_attaches_user():
    r = Retriever(user_registry={"youtube": lambda uid: {"id": f"yt:{uid}", "name": "N"}})
    out = r.resolve_user("youtube", {"media_id": "m1", "user_id": "42", "user": None})
    assert out["user"] == {"id": "yt:42", "name": "N"}
    assert out["user_id"] == "yt:42"  # reference sets userId from the looked-up user


def test_resolve_user_unresolved_drops_item():
    # no registry for the platform → getStreamUser null → item dropped
    r = Retriever(user_registry={"vimeo": lambda uid: None})
    assert r.resolve_user("youtube", {"media_id": "m", "user_id": "1"}) is None
    assert r.resolve_user("vimeo", {"media_id": "m", "user_id": "1"}) is None


def test_stream_users_first_new_media_wins(ray_session, tmp_path):
    """A user whose FIRST event re-arrives already-stored media must be
    recorded at their first NEW-media event, not their first event."""
    from mklab_focused_crawler_ray.pipelines.queries_media import (
        MEDIA_ARRIVAL_MOD,
        q_media_stream_users,
    )

    mod = MEDIA_ARRIVAL_MOD
    # media A (event_id 0 and mod) arrives at t=0 by user 1, re-arrives at
    # t=10 by user 2; user 2's new-media insert happens at t=20 (event 7).
    rows = [
        (0, 0, 1),        # media 0: NEW at t=0 → user 1 inserted at t=0
        (mod, 10, 2),     # media 0 again: exists → no user insert
        (7, 20, 2),       # media 7: NEW at t=20 → user 2 inserted at t=20
        (3, 30, 1),       # media 3: NEW, but user 1 already stored
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["x"] * len(rows), pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "events.parquet"))
    got = (
        q_media_stream_users(str(sf))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"user_id": [1, 2], "inserted_ts_us": [0, 20], "first_media_id": [0, 7]}
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
