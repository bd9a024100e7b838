"""Image-payload stages: decode / validate / embed / near-dup / cluster.

Ray-Data restatement of the reference's media pipeline
(``bolts/media/VisualIndexerBolt.java``, ``FeatureExtractorBolt.java``,
``ClustererBolt.java``) over the BASELINE ``input_hint`` table
``(image_id, bytes, w, h, fmt, caption, phash)``:

- :class:`DecodeValidate` — actor-pool ``map_batches`` stage: decode the
  ``bytes`` column (pure-python codecs; a real deployment swaps in
  PIL/libvips here — same signature), verify the per-row invariant
  (decoded-pixel PSNR ≥ 40 dB for the lossy ``q6`` format / exact for
  lossless, stored-phash reproducibility, byte-exact captions travel
  untouched) and emit measurement columns. DCT/codec state is built once
  per actor in ``__init__``.
- :class:`PseudoEmbed` — deterministic stand-in for SURF/VLAD/PCA
  (``VisualIndexerBolt.java:60-83``): decode → luma → area-resize to 16×16 →
  2-D DCT → flatten 64 low-frequency coeffs → L2-normalize. Same decode
  budget rule as the reference: images above ``max_pixels = 768*512`` are
  area-downscaled first (``VisualIndexerBolt.java:63``).
- :func:`phash_band_pairs` — near-dup candidate pairs by pHash band
  blocking (4 bands × 16 bits): explode (band, key) → groupby → pairs →
  verify Hamming ≤ ``max_hamming``. Mirrors the visual-index 0.85
  query gate (``VisualIndexerBolt.java:167-171``) with a distance metric
  computable without model weights.
- :func:`cluster_images` — connected components over the near-dup pairs
  with **deterministic min-member-id labels** (replacing the reference's
  ``UUID.randomUUID`` cluster ids, ``ClustererBolt.java:185`` — SURVEY.md
  §7.4). Pairs are tiny relative to images (SURVEY §2.6) so the union-find
  runs driver-side; labels are then broadcast-joined back in a
  ``map_batches`` over the full table.

Audio / video stages moved to :mod:`stages.av` — now REAL decoders for
the fixture codecs (stdlib WAV PCM-16, the RVID1 raw-frame container)
with optional soundfile/PyAV slots for compressed formats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..fixtures.codecs import (
    _dct_matrix,
    decode,
    phash64,
    phash_distance,
    psnr,
    resize_area,
    to_gray,
)

MAX_PIXELS = 768 * 512  # decode budget — VisualIndexerBolt.java:63
PSNR_MIN_DB = 40.0  # BASELINE input_hint per-row invariant
EMBED_DIM = 64

N_BANDS = 4
BAND_BITS = 16


# --------------------------------------------------------------------------
# decode + invariant validation
# --------------------------------------------------------------------------


class DecodeValidate:
    """batch (image_id, bytes, w, h, fmt, phash) → per-row invariant columns.

    Output: image_id, fmt, w_ok, h_ok, phash_ok, psnr_db_x100 (int64;
    2**31-1 sentinel for inf/lossless-exact), decode_ok.
    """

    def __init__(self, check_phash: bool = True):
        self.check_phash = check_phash
        _dct_matrix(32)  # warm the module-level DCT cache once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        phs = batch["phash"].to_numpy()
        n = len(ids)
        w_ok = np.zeros(n, bool)
        h_ok = np.zeros(n, bool)
        ph_ok = np.zeros(n, bool)
        dec_ok = np.zeros(n, bool)
        psnr_x100 = np.zeros(n, np.int64)
        INF = np.int64(2**31 - 1)
        for i in range(n):
            try:
                rgb = decode(blobs[i], fmts[i])
            except Exception:
                continue
            dec_ok[i] = True
            h_ok[i] = rgb.shape[0] == hs[i]
            w_ok[i] = rgb.shape[1] == ws[i]
            if self.check_phash:
                ph_ok[i] = phash64(rgb) == int(phs[i])
            if fmts[i] == "q6":
                # lossy: PSNR vs a re-encode→decode round trip must be
                # stable ≥ 40 dB (the codec is idempotent after one pass)
                from ..fixtures.codecs import q6_decode, q6_encode

                rt = q6_decode(q6_encode(rgb))
                p = psnr(rgb, rt)
                psnr_x100[i] = INF if np.isinf(p) else np.int64(round(p * 100))
            else:
                psnr_x100[i] = INF  # lossless: exact by construction
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                "decode_ok": pa.array(dec_ok),
                "w_ok": pa.array(w_ok),
                "h_ok": pa.array(h_ok),
                "phash_ok": pa.array(ph_ok),
                "psnr_db_x100": pa.array(psnr_x100, pa.int64()),
            }
        )


def decode_validate(images_parquet: str, concurrency=(1, 8), batch_size: int = 64):
    """Dataset pipeline: read (column-pruned) → DecodeValidate actor pool.

    batch_size is small because rows carry image payloads
    (SURVEY.md §7.4 wide-binary-rows note)."""
    import ray.data as rd

    return rd.read_parquet(
        images_parquet, columns=["image_id", "bytes", "w", "h", "fmt", "phash"]
    ).map_batches(
        DecodeValidate,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# pseudo-embedding (deterministic SURF/VLAD/PCA stand-in)
# --------------------------------------------------------------------------


class Thumbnail:
    """Decode → box/area resize to ``out``×``out`` → quantized uint8
    thumbnail + integer channel means — the resize leg of the reference's
    decode budget (``VisualIndexerBolt.java:60-63`` caps decoded size at
    maxNumPixels before feature extraction) as a standalone actor-pool
    stage. Output rows carry the thumbnail as a fixed-size ``binary``
    column (out*out*3 bytes, row-major RGB) plus mean_{r,g,b}_x100 int64s,
    so downstream stages (embedding, mosaics) consume pure Arrow."""

    def __init__(self, out: int = 8):
        self.out = out
        _dct_matrix(32)  # warm decode caches once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures.codecs import resize_area

        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        thumbs, means = [], np.zeros((len(ids), 3), np.int64)
        for i in range(len(ids)):
            rgb = decode(blobs[i], fmts[i])
            th = resize_area(rgb, self.out, self.out)
            q = np.clip(np.floor(th + 0.5), 0, 255).astype(np.uint8)
            thumbs.append(q.tobytes())
            means[i] = np.floor(th.reshape(-1, 3).mean(axis=0) * 100.0 + 0.5).astype(
                np.int64
            )
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "thumb": pa.array(thumbs, pa.binary()),
                "mean_r_x100": pa.array(means[:, 0], pa.int64()),
                "mean_g_x100": pa.array(means[:, 1], pa.int64()),
                "mean_b_x100": pa.array(means[:, 2], pa.int64()),
            }
        )


def thumbnail_images(
    images_parquet: str, out: int = 8, concurrency=(1, 8), batch_size: int = 64
):
    """Dataset pipeline: column-pruned read → Thumbnail actor pool (small
    batches — rows carry image payloads, SURVEY.md §7.4)."""
    import ray.data as rd

    return rd.read_parquet(
        images_parquet, columns=["image_id", "bytes", "fmt"]
    ).map_batches(
        Thumbnail,
        fn_constructor_kwargs={"out": out},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def lap_var_stats(rgb: np.ndarray) -> tuple[int, int]:
    """Integer Laplacian-variance sharpness statistic: (n_interior,
    lap_var_micro). Luma is the INTEGER BT.601-ish fold
    ``(77·R + 150·G + 29·B) >> 8`` (no float anywhere), the Laplacian is
    the 4-neighbor stencil over interior pixels, and the variance is the
    exact rational ``(n·Σx² − (Σx)²)·10⁶ // n²`` computed in PYTHON ints
    (Σx² alone overflows int64 past ~10⁷ interior pixels). Shared by the
    distributed actor stage and the sequential oracle path — both sides
    are this one function, so the signature table pins plumbing, not
    arithmetic. Images with no interior (h or w < 3) return (0, 0)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    luma = (77 * r + 150 * g + 29 * b) >> 8
    if luma.shape[0] < 3 or luma.shape[1] < 3:
        return 0, 0
    core = luma[1:-1, 1:-1]
    lap = (
        4 * core
        - luma[:-2, 1:-1]
        - luma[2:, 1:-1]
        - luma[1:-1, :-2]
        - luma[1:-1, 2:]
    )
    n = int(lap.size)
    s1 = int(lap.sum())
    s2 = int((lap.astype(object) * lap.astype(object)).sum())
    return n, ((n * s2 - s1 * s1) * 1_000_000) // (n * n)


EXPOSURE_DARK = 16  # luma below → underexposed pixel (BT.601 int luma)
EXPOSURE_BRIGHT = 239  # luma above → overexposed pixel


def exposure_stats(rgb: np.ndarray) -> tuple[int, int, int]:
    """(n_pixels, n_dark, n_bright) under the same integer BT.601 luma as
    ``lap_var_stats`` — the over/under-exposure junk gate (a mostly-black
    or blown-out image is curation junk even when sharp)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    luma = (77 * r + 150 * g + 29 * b) >> 8
    return (
        int(luma.size),
        int((luma < EXPOSURE_DARK).sum()),
        int((luma > EXPOSURE_BRIGHT).sum()),
    )


class ExposureStats:
    """batch (image_id, bytes, fmt) → (image_id, n_pixels, dark_ppm,
    bright_ppm) — exposure junk gate as an actor-pool stage; ppm in
    exact integer arithmetic (count·10⁶ // n)."""

    def __init__(self):
        _dct_matrix(32)  # warm decode caches once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        np_out = np.zeros(len(ids), np.int64)
        d_out = np.zeros(len(ids), np.int64)
        b_out = np.zeros(len(ids), np.int64)
        for i, (blob, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            n, d, br = exposure_stats(decode(blob, fmt))
            np_out[i] = n
            d_out[i] = (d * 1_000_000) // n if n else 0
            b_out[i] = (br * 1_000_000) // n if n else 0
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_pixels": pa.array(np_out, pa.int64()),
                "dark_ppm": pa.array(d_out, pa.int64()),
                "bright_ppm": pa.array(b_out, pa.int64()),
            }
        )


def exposure_scores(
    images_parquet: str, concurrency=(1, 8), batch_size: int = 64
):
    """Dataset pipeline: column-pruned read → ExposureStats actor pool."""
    import ray.data as rd

    return rd.read_parquet(
        images_parquet, columns=["image_id", "bytes", "fmt"]
    ).map_batches(
        ExposureStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class BlurScore:
    """batch (image_id, bytes, fmt) → (image_id, n_interior,
    lap_var_micro) — blur/sharpness gating for image-curation pipelines
    (low Laplacian variance = soft or empty image; the standard
    pre-training junk filter next to the decode/phash gates). Decode
    caches warm once per actor (the Thumbnail/PseudoEmbed contract)."""

    def __init__(self):
        _dct_matrix(32)  # warm decode caches once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        n_out = np.zeros(len(ids), np.int64)
        v_out = np.zeros(len(ids), np.int64)
        for i, (blob, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            n_out[i], v_out[i] = lap_var_stats(decode(blob, fmt))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_interior": pa.array(n_out, pa.int64()),
                "lap_var_micro": pa.array(v_out, pa.int64()),
            }
        )


def blur_scores(
    images_parquet: str, concurrency=(1, 8), batch_size: int = 64
):
    """Dataset pipeline: column-pruned read → BlurScore actor pool (small
    batches — rows carry image payloads, SURVEY.md §7.4)."""
    import ray.data as rd

    return rd.read_parquet(
        images_parquet, columns=["image_id", "bytes", "fmt"]
    ).map_batches(
        BlurScore,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def color_stats(rgb: np.ndarray) -> tuple[int, int, int, int]:
    """Integer color-distribution statistics: (n_pixels,
    chroma_mean_micro, dominant_bin, dominant_ppm).

    - ``chroma_mean_micro`` = exact mean per-pixel chroma (max(R,G,B) −
      min(R,G,B)) × 10⁶ // n — the colorfulness proxy behind the
      grayscale junk gate (a near-gray image is usually a diagram,
      placeholder or scanned page, not a photo).
    - ``dominant_bin`` / ``dominant_ppm`` = the 12-bit quantized RGB bin
      (4 bits/channel → 0..4095) holding the most pixels and its exact
      share × 10⁶ // n — the flat-color junk gate (placeholder/solid
      images concentrate in one bin). Ties break to the LOWEST bin
      (``np.bincount(...).argmax()``), deterministic on every host.

    All arithmetic is integer-exact and shared verbatim by the
    distributed actor stage and the sequential oracle path (the
    ``lap_var_stats`` discipline), so the signature-table comparison
    pins plumbing, not arithmetic. Headroom: Σchroma ≤ 255·n, so the
    ×10⁶ numerator stays inside int64 up to ~3.6×10¹⁰ pixels/image —
    far past the decode budget; computed in PYTHON ints anyway to match
    the house overflow rule. Empty images return (0, 0, 0, 0)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    n = int(r.size)
    if n == 0:
        return 0, 0, 0, 0
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    chroma_sum = int((mx - mn).sum())
    chroma_mean_micro = (chroma_sum * 1_000_000) // n
    bins = ((r >> 4) << 8) | ((g >> 4) << 4) | (b >> 4)
    counts = np.bincount(bins.ravel(), minlength=4096)
    dom = int(counts.argmax())
    dom_ppm = (int(counts[dom]) * 1_000_000) // n
    return n, chroma_mean_micro, dom, dom_ppm


class ColorStats:
    """batch (image_id, bytes, fmt) → (image_id, n_pixels,
    chroma_mean_micro, dominant_bin, dominant_ppm) — grayscale /
    flat-color junk statistics as an actor-pool stage (decode caches
    warm once per actor, the BlurScore contract)."""

    def __init__(self):
        _dct_matrix(32)  # warm decode caches once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        n_out = np.zeros(len(ids), np.int64)
        c_out = np.zeros(len(ids), np.int64)
        b_out = np.zeros(len(ids), np.int64)
        p_out = np.zeros(len(ids), np.int64)
        for i, (blob, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            n_out[i], c_out[i], b_out[i], p_out[i] = color_stats(
                decode(blob, fmt)
            )
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_pixels": pa.array(n_out, pa.int64()),
                "chroma_mean_micro": pa.array(c_out, pa.int64()),
                "dominant_bin": pa.array(b_out, pa.int64()),
                "dominant_ppm": pa.array(p_out, pa.int64()),
            }
        )


def color_scores(
    images_parquet: str, concurrency=(1, 8), batch_size: int = 64
):
    """Dataset pipeline: column-pruned read → ColorStats actor pool."""
    import ray.data as rd

    return rd.read_parquet(
        images_parquet, columns=["image_id", "bytes", "fmt"]
    ).map_batches(
        ColorStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def dhash64(rgb: np.ndarray) -> int:
    """64-bit difference (gradient) hash: gray → area-resize 8×9 →
    bit = left-to-right brightness increase per adjacent column pair
    (8 rows × 8 comparisons). The classic cheap complement to the DCT
    pHash — dHash sees local gradients where pHash sees global
    frequency structure, so their pair sets disagree in instructive
    ways (q_image_dhash_agreement measures exactly that). Same float64
    resize discipline as ``fixtures.codecs.phash64`` (one shared kernel
    for the sequential oracle path and the distributed actor stage)."""
    from ..fixtures.codecs import resize_area, to_gray

    g = resize_area(to_gray(rgb), 8, 9)
    bits = g[:, 1:] > g[:, :-1]  # (8, 8)
    val = 0
    for b in bits.flatten():
        val = (val << 1) | int(b)
    return int(np.int64(val & 0x7FFFFFFFFFFFFFFF))  # signed int64 domain


class DHash:
    """batch (image_id, bytes, fmt) → (image_id, phash) where the
    column holds the 64-bit dHash — NAMED ``phash`` so the banded
    pairing pipeline (``phash_band_pairs``) consumes the output
    verbatim; decode caches warm once per actor."""

    def __init__(self):
        _dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        out = np.zeros(len(ids), np.int64)
        for i, (blob, fmt) in enumerate(
            zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ):
            out[i] = dhash64(decode(blob, fmt))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(out, pa.int64()),
            }
        )


def dhash_scores(
    images_parquet: str, concurrency=(1, 8), batch_size: int = 64
):
    """Dataset pipeline: column-pruned read → DHash actor pool."""
    import ray.data as rd

    return rd.read_parquet(
        images_parquet, columns=["image_id", "bytes", "fmt"]
    ).map_batches(
        DHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def pseudo_embed_rgb(rgb: np.ndarray) -> np.ndarray:
    """Deterministic 64-dim unit vector from pixels: luma → budgeted
    downscale → 16×16 area resize → 2-D DCT-II → flatten → L2 normalize."""
    h, w = rgb.shape[:2]
    if h * w > MAX_PIXELS:
        scale = (MAX_PIXELS / (h * w)) ** 0.5
        rgb = resize_area(rgb.astype(np.float64), max(1, int(h * scale)), max(1, int(w * scale)))
    g = resize_area(to_gray(rgb), 16, 16)
    d16 = _dct_matrix(16)
    # drop the DC coefficient (index 0): mean brightness is near-constant
    # across the corpus and would dominate the cosine (cf. phash64)
    coef = (d16 @ g @ d16.T).flatten()[1 : EMBED_DIM + 1]
    nrm = np.linalg.norm(coef)
    return coef / nrm if nrm > 0 else coef


class PseudoEmbed:
    """batch (image_id, bytes, fmt) → (image_id, embedding list<float>).

    ``weights`` is the REAL-MODEL SLOT (VERDICT r4 'Next round' #10): pass
    a checkpoint path/identifier and __init__ loads it ONCE PER ACTOR —
    the FeatureExtractorBolt load-once contract. The pinned default
    (None) selects the deterministic DCT pseudo-embed whose bytes the
    image_embed oracle signature table pins; tests/test_weight_slots.py
    asserts the default path stays byte-identical. Real checkpoints are
    unavailable in this sandbox, so a non-None value raises
    NotImplementedError at actor construction (fails fast on pool spawn)."""

    def __init__(self, weights: str | None = None):
        if weights is not None:
            raise NotImplementedError(
                "real embedding checkpoints are not available in this "
                "sandbox; load the model here (once per actor) when they are"
            )
        _dct_matrix(16)
        _dct_matrix(32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        embs = [
            pseudo_embed_rgb(decode(b, f)).astype(np.float32)
            for b, f in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist())
        ]
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "embedding": pa.array([e.tolist() for e in embs], pa.list_(pa.float32())),
            }
        )


def embed_images(
    images_parquet: str,
    concurrency=(1, 8),
    batch_size: int = 64,
    weights: str | None = None,
):
    import ray.data as rd

    return rd.read_parquet(
        images_parquet, columns=["image_id", "bytes", "fmt"]
    ).map_batches(
        PseudoEmbed,
        fn_constructor_kwargs={"weights": weights},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# pHash-band near-dup pairs
# --------------------------------------------------------------------------


def _band_explode(batch: pa.Table) -> pa.Table:
    """(image_id, phash) → N_BANDS rows (band, key, image_id, phash)."""
    ph = batch["phash"].to_numpy().view(np.uint64)
    ids = batch["image_id"].to_pylist()
    n = len(ids)
    bands = np.repeat(np.arange(N_BANDS, dtype=np.int32), n)
    keys = np.concatenate(
        [((ph >> np.uint64(b * BAND_BITS)) & np.uint64((1 << BAND_BITS) - 1)).astype(np.int64) for b in range(N_BANDS)]
    )
    return pa.table(
        {
            "band": pa.array(bands, pa.int32()),
            "key": pa.array(keys, pa.int64()),
            "image_id": pa.array(ids * N_BANDS, pa.string()),
            "phash": pa.array(np.tile(ph.view(np.int64), N_BANDS), pa.int64()),
        }
    )


def _group_pairs(max_hamming: int):
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("image_id")
        ids = g["image_id"].to_numpy()
        ph = g["phash"].to_numpy()
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = phash_distance(int(ph[i]), int(ph[j]))
                if d <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    d_out.append(d)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "hamming": d_out})

    return pairs


def phash_band_pairs(images_parquet: str, max_hamming: int = 8):
    """Candidate blocking on equal 16-bit pHash bands, exact Hamming verify,
    distinct pairs. Returns a Dataset of (id_a, id_b, hamming), id_a < id_b.

    Hot-key prefilter (the r2 MinHash-LSH discipline): a band group can
    only emit a pair if ≥ 2 images share the key, and at any scale the
    overwhelming majority of band keys are singletons — so a cheap
    count aggregate first finds the COLLIDING keys (bounded by actual
    near-dup mass, broadcast as one sorted int array), and the per-group
    pairing UDF then runs over only those groups instead of one pandas
    call per mostly-singleton group (measured 3-4 s → sub-second at the
    5k-image tier; output bit-identical, pinned by the band-replay
    oracle). The exploded table is recomputed for the second pass — a
    column-pruned (image_id, phash) read, never the bytes column."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    def exploded():
        return rd.read_parquet(
            images_parquet, columns=["image_id", "phash"]
        ).map_batches(_band_explode, batch_format="pyarrow")

    def hot_partial(batch: pa.Table) -> pa.Table:
        # LOCAL per-batch key counts (vectorized Arrow group_by) — no
        # shuffle; the driver folds (distinct-key × n_batches)-bounded
        # partials, so the pipeline keeps exactly the two shuffles the
        # un-filtered version had (pairing + pair dedup)
        comp = pa.array(
            batch["band"].to_numpy().astype(np.int64) * (1 << BAND_BITS)
            + batch["key"].to_numpy().astype(np.int64),
            pa.int64(),
        )
        t = pa.table(
            {"comp": comp, "one": pa.array(np.ones(len(batch), np.int64))}
        )
        return t.group_by("comp").aggregate([("one", "sum")])

    cnt = (
        exploded()
        .map_batches(hot_partial, batch_format="pyarrow")
        .to_pandas()  # distinct-key × n_batches-bounded
        .groupby("comp")["one_sum"]
        .sum()
    )
    hot = np.sort(cnt.index.to_numpy()[cnt.to_numpy() >= 2].astype(np.int64))
    hot_ref = ray.put(hot)

    def keep_hot(batch: pa.Table) -> pa.Table:
        h = ray.get(hot_ref)
        if len(h) == 0:
            return batch.slice(0, 0)
        comp = (
            batch["band"].to_numpy().astype(np.int64) * (1 << BAND_BITS)
            + batch["key"].to_numpy().astype(np.int64)
        )
        pos = np.searchsorted(h, comp)
        m = (pos < len(h)) & (h[np.minimum(pos, len(h) - 1)] == comp)
        return batch.filter(pa.array(m))

    return (
        exploded()
        .map_batches(keep_hot, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(_group_pairs(max_hamming), batch_format="pandas")
        # a pair can match in several bands → dedup on (id_a, id_b)
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# --------------------------------------------------------------------------
# connected-component clustering (deterministic min-id labels)
# --------------------------------------------------------------------------


def union_find_labels(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Min-member-id connected components over an edge list."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes: set[str] = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


def cluster_images(images_parquet: str, max_hamming: int = 8):
    """Near-dup clusters: pHash-band pairs → the SHARED vectorized
    min-label pointer-jumping CC kernel (``pipelines.queries.cc_min_label``
    — the same one ``dup_clusters`` runs; replaces the former per-pair
    driver union-find, VERDICT r4 'What's wrong' #5) → broadcast label map
    (bounded by paired images) → map_batches label join. Index-encoding
    via ``np.unique`` makes min-index equal min-string, so labels are
    bit-identical to the old min-string union-find. Returns (image_id,
    cluster_id); singletons get their own id."""
    import ray
    import ray.data as rd

    from ..pipelines.queries import cc_min_label

    pairs_tbl = phash_band_pairs(images_parquet, max_hamming).to_pandas()
    a = pairs_tbl["id_a"].to_numpy(object).astype(str)
    b = pairs_tbl["id_b"].to_numpy(object).astype(str)
    if len(a):
        nodes_s = np.unique(np.concatenate([a, b]))
        idx, rep = cc_min_label(
            np.searchsorted(nodes_s, a), np.searchsorted(nodes_s, b)
        )
        labels = dict(zip(nodes_s[idx].tolist(), nodes_s[rep].tolist()))
    else:
        labels = {}
    label_ref = ray.put(labels)

    class Label:
        def __init__(self):
            self.labels = ray.get(label_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            return pa.table(
                {
                    "image_id": pa.array(ids, pa.string()),
                    "cluster_id": pa.array(
                        [self.labels.get(i, i) for i in ids], pa.string()
                    ),
                }
            )

    return rd.read_parquet(images_parquet, columns=["image_id"]).map_batches(
        Label, batch_format="pyarrow", concurrency=2
    )


