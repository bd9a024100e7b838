"""The real-model weight slots (PseudoEmbed / EntityExtractor): the pinned
default (weights=None) must stay byte-identical to the deterministic path,
and a non-None checkpoint must fail fast at actor construction."""

from __future__ import annotations

import numpy as np
import pytest

from mklab_focused_crawler_ray.stages.image import PseudoEmbed
from mklab_focused_crawler_ray.stages.nlp import EntityExtractor


def test_weight_slot_rejects_checkpoints_fast():
    with pytest.raises(NotImplementedError):
        PseudoEmbed(weights="/ckpt/clip.bin")
    with pytest.raises(NotImplementedError):
        EntityExtractor(weights="/ckpt/ner.crf")


def test_default_embed_path_byte_identical(ray_session):
    """weights=None through the full actor-pool stage reproduces the
    sequential pseudo_embed_rgb float32 bytes exactly (the image_embed
    oracle's contract)."""
    import pyarrow.parquet as pq

    from mklab_focused_crawler_ray.fixtures.codecs import decode as cdecode
    from mklab_focused_crawler_ray.pipelines.queries_media import fixture_dir_for
    from mklab_focused_crawler_ray.stages.image import embed_images, pseudo_embed_rgb

    import os

    fdir = fixture_dir_for("/root/testdata/sf0.001")  # tiny tier
    images = os.path.join(fdir, "images.parquet")
    got = (
        embed_images(images, weights=None)
        .to_pandas()
        .set_index("image_id")["embedding"]
    )
    src = pq.read_table(images, columns=["image_id", "bytes", "fmt"])
    for iid, blob, fmt in zip(
        src["image_id"].to_pylist()[:25],
        src["bytes"].to_pylist()[:25],
        src["fmt"].to_pylist()[:25],
    ):
        want = pseudo_embed_rgb(cdecode(blob, fmt)).astype(np.float32)
        have = np.asarray(got[iid], np.float32)
        assert have.tobytes() == want.tobytes(), iid


def test_default_ner_path_identical():
    from mklab_focused_crawler_ray.stages.nlp import extract_entities

    import pyarrow as pa

    ex = EntityExtractor()  # pinned default
    batch = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "title": pa.array(
                [
                    "Alice_Person met Bob_Person in Paris_Location",
                    "no entities here",
                ],
                pa.string(),
            ),
        }
    )
    out = ex(batch)
    assert out["entities"].to_pylist() == [
        extract_entities("Alice_Person met Bob_Person in Paris_Location"),
        [],
    ]
