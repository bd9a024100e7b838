"""Media fetch + decode + embed stage for the crawl round pipeline.

Ray-Data restatement of the Crawler topology's visual-indexing path
(``Crawler.java:203-212``): every media item extracted from a fetched page
is fetched (offline: zero-copy lookup into the image store by image id),
decoded, and embedded (``bolts/media/VisualIndexerBolt.java:148-164`` —
here the deterministic DCT pseudo-embedding of stages/image.py), with its
pHash recomputed from pixels. Output columns are per-page lists aligned
with the ``media`` struct list.

The image store is broadcast once as (sorted id-hash numpy array, Arrow
table) — zero-copy per task, the same pattern as stages/fetch.py. At 100 TB
the store is hash-partitioned Lance and this becomes a bucketed join by
image-id hash; the stage body is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures.codecs import decode, phash64
from ..functions.urls import url_hash64, url_hash64_vec
from .image import pseudo_embed_rgb


def build_image_store(images: pa.Table):
    """(image_id, bytes, fmt) → (sorted id-hash np.uint64, sorted table)."""
    h = url_hash64_vec(images["image_id"].to_pylist())
    order = np.argsort(h, kind="stable")
    tbl = images.select(["image_id", "bytes", "fmt"]).take(pa.array(order)).combine_chunks()
    return h[order], tbl


# Worker-process-local memo of (phash, embedding) per image id. Decode +
# embed is a pure function of the image bytes, and crawled pages reference
# the same images repeatedly (the medium bench tier averages ~8 live refs
# per page over 8k distinct images → ~99% redundant embeds without this).
# Bounded by a clear-on-full cap; outputs are bit-identical with or
# without the cache.
# keyed by (image_id, embed_dim, store_token): two embed stages with
# different dims or image stores sharing a worker process must not
# serve each other's vectors (ADVICE r2, low)
_EMBED_CACHE: dict[tuple, tuple[int, list]] = {}
_EMBED_CACHE_MAX = 65_536


def image_id_of_src(src: str) -> str:
    """Fixture convention: the image id is the last path segment of the
    <img> src (https://img.<host>/<image_id>)."""
    return src.rsplit("/", 1)[-1]


def make_media_embed(
    image_store_ref, embed_dim: int = 64, media_seen_ref=None, use_cache: bool = True
):
    """Task-based map_batches stage: for each row's media list, look up the
    image bytes, decode, pseudo-embed and re-hash. Appends aligned list
    columns media_image_ids / media_phash / media_vec (empty lists when the
    page has no media or the image is unknown → status mirrored per item).

    ``media_seen_ref`` (optional): broadcast sorted uint64 hash array of
    media ids embedded in STRICTLY EARLIER rounds — the StatusCheckBolt
    dedup gate in front of the visual indexer
    (``bolts/media/StatusCheckBolt.java:59-68``), applied at round
    granularity so the outcome is deterministic (within-round duplicates
    all process; Storm's arrival-order gate is nondeterministic)."""
    store_token = (
        image_store_ref.hex()
        if hasattr(image_store_ref, "hex")
        else str(id(image_store_ref))
    )

    def media_embed(batch: pa.Table) -> pa.Table:
        import ray

        hashes, tbl = ray.get(image_store_ref)
        seen = ray.get(media_seen_ref) if media_seen_ref is not None else None
        ids_col = tbl["image_id"]
        bytes_col = tbl["bytes"]
        fmt_col = tbl["fmt"]

        def lookup(image_id: str):
            h = np.uint64(url_hash64(image_id))
            i = int(np.searchsorted(hashes, h))
            while i < len(hashes) and hashes[i] == h:
                if ids_col[i].as_py() == image_id:
                    return bytes_col[i].as_py(), fmt_col[i].as_py()
                i += 1
            return None, None

        out_ids, out_ph, out_vec = [], [], []
        for media_cell in batch["media"]:
            items = media_cell.as_py() or []
            ids_row, ph_row, vec_row = [], [], []
            for m in items:
                image_id = image_id_of_src(m["media_url"])
                if seen is not None and len(seen):
                    h = np.uint64(url_hash64(image_id))
                    j = int(np.searchsorted(seen, h))
                    if j < len(seen) and seen[j] == h:
                        continue  # media-seen gate: already indexed
                ck = (image_id, embed_dim, store_token)
                cached = _EMBED_CACHE.get(ck) if use_cache else None
                if cached is None:
                    blob, fmt = lookup(image_id)
                    if blob is None:
                        continue  # unknown image — reference drops silently
                    rgb = decode(blob, fmt)
                    cached = (
                        phash64(rgb),
                        pseudo_embed_rgb(rgb).astype(np.float32)[:embed_dim].tolist(),
                    )
                    if use_cache:
                        if len(_EMBED_CACHE) >= _EMBED_CACHE_MAX:
                            _EMBED_CACHE.clear()  # simple bound; refill is cheap
                        _EMBED_CACHE[ck] = cached
                ids_row.append(image_id)
                ph_row.append(cached[0])
                vec_row.append(cached[1])
            out_ids.append(ids_row)
            out_ph.append(ph_row)
            out_vec.append(vec_row)
        return (
            batch.append_column(
                "media_image_ids", pa.array(out_ids, pa.list_(pa.string()))
            )
            .append_column("media_phash", pa.array(out_ph, pa.list_(pa.int64())))
            .append_column(
                "media_vec", pa.array(out_vec, pa.list_(pa.list_(pa.float32())))
            )
        )

    return media_embed
