"""Audio / video stages (stages/av.py): real fixture codecs (stdlib WAV
PCM-16, the RVID1 raw-frame container), integer feature kernels, the
actor-pool Ray plumbing, and the codec-slot NotImplementedError contract.

Reference lineage: no audio/video payload path exists in the reference
(the only video-shaped code is the dead metadata walk,
ArticleExtractionBolt.java:552-596); these are the build brief's
multimodal additions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mklab_focused_crawler_ray.stages.av import (
    AudioFeatures,
    VideoFrameSample,
    audio_features,
    decode_rvid_frames,
    decode_wav_pcm16,
    encode_rvid,
    encode_wav_pcm16,
    frame_signature,
    rvid_header,
)


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, 1000, dtype=np.int16)
    blob = encode_wav_pcm16(samples, 8000)
    assert blob[:4] == b"RIFF"
    dec, sr = decode_wav_pcm16(blob)
    assert sr == 8000
    np.testing.assert_array_equal(dec, samples)


def test_rvid_roundtrip_and_sampling():
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (9, 12, 16, 3), dtype=np.uint8)
    blob = encode_rvid(frames, fps=20)
    assert rvid_header(blob) == (16, 12, 9, 20)
    # full decode is byte-exact
    full = list(decode_rvid_frames(blob, 1))
    assert [i for i, _ in full] == list(range(9))
    for i, f in full:
        np.testing.assert_array_equal(f, frames[i])
    # every_n sampling picks exactly frames 0, n, 2n, ...
    sampled = list(decode_rvid_frames(blob, 4))
    assert [i for i, _ in sampled] == [0, 4, 8]
    for i, f in sampled:
        np.testing.assert_array_equal(f, frames[i])


def test_audio_features_integer_exact():
    x = np.array([0, 3, -4, 0, 5], np.int16)
    f = audio_features(x, 8000)
    # sqrt((9+16+25)/5) = sqrt(10) = 3.162... -> 3
    assert f == {"sr": 8000, "n_samples": 5, "rms": 3, "peak": 5, "zero_cross": 2}
    assert audio_features(np.array([], np.int16), 8000)["rms"] == 0


def test_frame_signature_luma_is_integer_rec601():
    frame = np.full((2, 2, 3), 100, np.uint8)
    _h, lum = frame_signature(frame)
    assert lum == 100 * (299 + 587 + 114) // 1  # == 100_000 milli-luma
    # distinct frames hash differently
    h1, _ = frame_signature(frame)
    h2, _ = frame_signature(frame + 1)
    assert h1 != h2


def test_audio_actor_stage_matches_sequential():
    rng = np.random.default_rng(3)
    blobs, ids = [], []
    for i in range(5):
        s = rng.integers(-20000, 20000, int(rng.integers(50, 400)), dtype=np.int16)
        blobs.append(encode_wav_pcm16(s, 8000))
        ids.append(f"c{i}")
    out = AudioFeatures()(pa.table({"clip_id": ids, "bytes": blobs}))
    assert out.column_names == ["clip_id", "sr", "n_samples", "rms", "peak", "zero_cross"]
    for row, blob in zip(out.to_pylist(), blobs):
        samples, sr = decode_wav_pcm16(blob)
        expect = audio_features(samples, sr)
        assert {k: row[k] for k in expect} == expect


def test_video_actor_stage_explodes_sampled_frames():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (7, 8, 8, 3), dtype=np.uint8)
    blob = encode_rvid(frames, fps=10)
    out = VideoFrameSample(every_n=3)(
        pa.table({"video_id": ["v0"], "bytes": [blob]})
    ).to_pylist()
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    for r in out:
        hsh, lum = frame_signature(frames[r["frame_idx"]])
        assert r["frame_hash"] == hsh and r["mean_lum_milli"] == lum


def test_codec_slots_raise_cleanly_for_foreign_containers():
    # non-WAV / non-RVID payloads need the optional libs (absent here)
    with pytest.raises(NotImplementedError):
        AudioFeatures()(pa.table({"clip_id": ["a"], "bytes": [b"\x00\x01"]}))
    with pytest.raises(NotImplementedError):
        VideoFrameSample()(pa.table({"video_id": ["v"], "bytes": [b"\x00\x01"]}))


def test_fixture_tables_deterministic():
    from mklab_focused_crawler_ray.fixtures.generate import gen_audio, gen_videos

    a1, a2 = gen_audio(4, seed=9), gen_audio(4, seed=9)
    assert a1.equals(a2)
    v1, v2 = gen_videos(3, seed=9), gen_videos(3, seed=9)
    assert v1.equals(v2)
    # stored metadata matches the payload headers
    for row in v1.to_pylist():
        assert rvid_header(row["bytes"]) == (
            row["w"],
            row["h"],
            row["n_frames"],
            row["fps"],
        )
    for row in a1.to_pylist():
        samples, sr = decode_wav_pcm16(row["bytes"])
        assert (sr, len(samples)) == (row["sr"], row["n_samples"])


def test_av_queries_through_ray(ray_session):
    """End-to-end over the tiny fixture tier: the distributed actor-pool
    stages equal the sequential signature tables row-for-row."""
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.pipelines.queries_media import (
        audio_signature_parquet,
        fixture_dir_for,
        q_audio_clip_stats,
        q_video_frame_stats,
        video_signature_parquet,
    )

    sf = "/root/testdata/sf0.001"
    fdir = fixture_dir_for(sf)

    got = q_audio_clip_stats(sf).to_pandas().sort_values("clip_id").reset_index(drop=True)
    exp = (
        pq.read_table(audio_signature_parquet(fdir))
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp[got.columns.tolist()])

    gotv = (
        q_video_frame_stats(sf)
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    expv = (
        pq.read_table(video_signature_parquet(fdir))
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert gotv.equals(expv[gotv.columns.tolist()])


def test_video_dup_pairs_finds_planted_dups(ray_session):
    """The v2 fixture plants verbatim-re-encode and prefix-truncation
    dups; the miner must recover at least the verbatim ones (identical
    sampled frame hashes → Jaccard 1.0)."""
    from mklab_focused_crawler_ray.pipelines.queries_media import (
        q_video_dup_pairs,
    )

    got = q_video_dup_pairs("/root/testdata/sf0.001").to_pandas()
    assert len(got) >= 1
    assert (got["video_a"] < got["video_b"]).all()
    assert (got["jaccard_micro"] >= 500_000).all()
    assert (got["jaccard_micro"] <= 1_000_000).all()


def test_video_scene_cuts_recovers_planted_gap(ray_session):
    """The v3 fixture plants 1-4 scenes per original with a PROVABLE
    luma-delta gap (within-scene sampled delta exactly 5000 milli, cut
    delta ≥ 91000 — no pixel clipping); the census must be discriminative
    (some 0-cut videos, some ≥1) and bounded by n_sampled - 1."""
    from mklab_focused_crawler_ray.pipelines.queries_media import (
        VIDEO_CUT_THRESH_MILLI,
        q_video_scene_cuts,
    )

    assert VIDEO_CUT_THRESH_MILLI == 48_000  # sits inside the planted gap
    got = q_video_scene_cuts("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 16  # every tiny-fixture video, including dups
    assert (got["n_cuts"] >= 0).all()
    assert (got["n_cuts"] <= got["n_sampled"] - 1).all()
    assert (got["n_cuts"] == 0).any() and (got["n_cuts"] >= 1).any()
