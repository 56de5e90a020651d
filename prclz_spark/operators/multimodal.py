"""Multimodal column operators: decode, fidelity check, resize,
frame-sample — image/audio/video payloads as opaque ``binary`` columns
with typed metadata (the graft's input_hint schema).

Everything Spark-side is real (schemas, Arrow batching, partitioning);
the only stubs are *external* codecs (JPEG/PNG/audio) because no media
libraries exist in this sandbox — they are gated behind an import-try
with the exact batch contract documented, so a real decoder drops in
without touching the plumbing (SURVEY.md §7.1). The 'raw'/'q6' formats
(functions.imagecodec) decode with numpy alone and exercise the full
path, including the lossy-fidelity gate.

Fidelity gate (input_hint): per row, decoded pixels must reach PSNR >= 40
dB against the source (allclose for lossless) and the caption must match
exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions import imagecodec
from ..sources import synth

NUMPY_FORMATS = ("raw", "q6")


def _decode_any(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt in NUMPY_FORMATS:
        return imagecodec.decode(buf, w, h, fmt)
    # external-format stub: same contract — bytes -> (h, w, 3) uint8.
    try:  # pragma: no cover - library absent in this environment
        import PIL.Image  # noqa: F401
        import io

        return np.asarray(PIL.Image.open(io.BytesIO(buf)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            f"no decoder for fmt={fmt!r} in this environment; "
            "install an image library or use 'raw'/'q6'"
        )


FIDELITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("psnr_db", T.DoubleType()),  # 999.0 = lossless/inf
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("fidelity_ok", T.BooleanType()),
    ]
)


_LUMA = np.array([0.299, 0.587, 0.114])


def _pixels_batch(ids: np.ndarray, w: int, h: int) -> np.ndarray:
    """(n,h,w,3) reference pixels — synth.pixels_for_id vectorized over
    the whole Arrow batch (same integer arithmetic, one allocation)."""
    ys, xs = np.mgrid[0:h, 0:w]
    base = (
        (xs * 3 + ys * 7)[None, :, :, None]
        + ((ids % 997) * 13)[:, None, None, None]
        + np.array([0, 31, 62])
    )
    return (base % 256).astype(np.uint8)


def _phash_batch(dec: np.ndarray) -> list[int]:
    """imagecodec.phash64 vectorized over (n,h,w,3) when the dims divide
    by 8 (then the linspace block boundaries are exactly the reshape
    blocks); falls back to the scalar kernel otherwise."""
    n, h, w, _ = dec.shape
    if h % 8 != 0 or w % 8 != 0:
        return [imagecodec.phash64(dec[i]) for i in range(n)]
    luma = dec.astype(np.float64) @ _LUMA
    blocks = luma.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4)).reshape(n, 64)
    med = np.median(blocks, axis=1)
    bits = blocks > med[:, None]
    out = []
    for row in bits:
        val = int.from_bytes(np.packbits(row).tobytes(), "big")
        out.append(val - (1 << 64) if val >= (1 << 63) else val)
    return out


def payload_fidelity(images: DataFrame, psnr_floor: float = 40.0) -> DataFrame:
    """Per-row fidelity vs the deterministic source imagery: decode the
    payload, re-synthesize the reference pixels from the row id, compare.
    PSNR of exact matches reports as 999.0 (inf is not Parquet-friendly).

    Decode is inherently per-image, but everything else is batched: rows
    are grouped by (w, h, fmt) inside each Arrow batch, and reference
    synthesis / decode / PSNR / exactness / phash each run as ONE numpy
    pass over the stacked group (no per-row re-encode: a payload is exact
    iff its decode equals the requantized reference, computed once)."""

    def per_batch(batches):
        cols = [f.name for f in FIDELITY_SCHEMA.fields]
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            psnr_db = np.zeros(len(pdf))
            exact = np.zeros(len(pdf), dtype=bool)
            ph_ok = np.zeros(len(pdf), dtype=bool)
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                idx = g.index.to_numpy()
                pos = pdf.index.get_indexer(idx)
                if fmt not in NUMPY_FORMATS:
                    # external-codec stub path: per-row decode contract
                    for p_i, r in zip(pos, g.itertuples(index=False)):
                        i = int(r.image_id.split("_")[1])
                        ref = synth.pixels_for_id(i, w, h)
                        dec = _decode_any(r.bytes, w, h, fmt)
                        p = imagecodec.psnr(ref, dec)
                        psnr_db[p_i] = 999.0 if np.isinf(p) else float(p)
                        exact[p_i] = np.array_equal(dec, ref)
                        ph_ok[p_i] = imagecodec.phash64(dec) == r.phash
                    continue
                ids = np.array(
                    [int(s.split("_")[1]) for s in g["image_id"]], dtype=np.int64
                )
                refs = _pixels_batch(ids, w, h)
                dec = np.frombuffer(
                    b"".join(g["bytes"]), dtype=np.uint8
                ).reshape(len(g), h, w, 3)
                if fmt == "q6":
                    dec = (
                        (dec.astype(np.uint16) << 2) | (dec.astype(np.uint16) >> 4)
                    ).astype(np.uint8)
                    ref_dec = (
                        ((refs >> 2).astype(np.uint16) << 2)
                        | ((refs >> 2).astype(np.uint16) >> 4)
                    ).astype(np.uint8)
                else:
                    ref_dec = refs
                mse = (
                    (dec.astype(np.float64) - refs.astype(np.float64)) ** 2
                ).mean(axis=(1, 2, 3))
                with np.errstate(divide="ignore"):
                    p = np.where(
                        mse == 0, 999.0, 10.0 * np.log10(255.0 * 255.0 / np.maximum(mse, 1e-300))
                    )
                psnr_db[pos] = p
                exact[pos] = (dec == ref_dec).all(axis=(1, 2, 3))
                ph_ok[pos] = np.array(_phash_batch(dec)) == g["phash"].to_numpy()
            cap_ok = (
                pdf["caption"] == "synthetic caption " + pdf["image_id"]
            ).to_numpy()
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "fmt": pdf["fmt"].to_numpy(),
                    "psnr_db": np.round(psnr_db, 6),
                    "caption_ok": cap_ok,
                    "phash_ok": ph_ok,
                    "fidelity_ok": cap_ok & ph_ok & exact & (psnr_db >= psnr_floor),
                },
                columns=cols,
            )

    return images.mapInPandas(per_batch, FIDELITY_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def _decode_group(g: pd.DataFrame, w: int, h: int, fmt: str) -> np.ndarray:
    """Stacked (n,h,w,3) uint8 decode of one (w,h,fmt) group — ONE
    frombuffer + one vectorized dequantize for the numpy formats, the
    per-row external-codec contract otherwise."""
    if fmt in NUMPY_FORMATS:
        dec = np.frombuffer(b"".join(g["bytes"]), dtype=np.uint8).reshape(
            len(g), h, w, 3
        )
        if fmt == "q6":
            dec = (
                (dec.astype(np.uint16) << 2) | (dec.astype(np.uint16) >> 4)
            ).astype(np.uint8)
        return dec
    return np.stack([_decode_any(b, w, h, fmt) for b in g["bytes"]])


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resample (pure numpy index grid) re-encoded as
    'raw'. The standard image-tower preprocessing step at table scale:
    one mapInPandas pass, output partitioning inherited from input; rows
    are grouped by (w, h, fmt) inside each Arrow batch so the decode and
    the gather are single stacked numpy ops per group (no per-row Python
    on the pixel path)."""

    cols = [f.name for f in RESIZE_SCHEMA.fields]

    def per_batch(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            out_bytes: list = [None] * len(pdf)
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                pos = pdf.index.get_indexer(g.index.to_numpy())
                dec = _decode_group(g, w, h, fmt)
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                res = dec[:, ys][:, :, xs]  # (n, out_h, out_w, 3)
                for k, p_i in enumerate(pos):
                    out_bytes[p_i] = res[k].tobytes()
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "bytes": out_bytes,
                    "w": out_w,
                    "h": out_h,
                    "fmt": "raw",
                },
                columns=cols,
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        per_batch, RESIZE_SCHEMA
    )


STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("luma_sum_1000", T.LongType()),
    ]
)

_LUMA_INT = np.array([299, 587, 114], dtype=np.int64)


def decode_stats(images: DataFrame) -> DataFrame:
    """Exact integer luma statistics per image: decode the payload and sum
    299·R + 587·G + 114·B over all pixels (bigint — no float summation
    order, so the value is reproducible bit-for-bit by any engine,
    including a SQL oracle over the synthetic pixel pattern). One stacked
    decode + one GEMM per (w, h, fmt) group per Arrow batch."""

    cols = [f.name for f in STATS_SCHEMA.fields]

    def per_batch(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            sums = np.zeros(len(pdf), dtype=np.int64)
            npx = np.zeros(len(pdf), dtype=np.int64)
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                pos = pdf.index.get_indexer(g.index.to_numpy())
                dec = _decode_group(g, w, h, fmt).astype(np.int64)
                sums[pos] = (dec @ _LUMA_INT).sum(axis=(1, 2))
                npx[pos] = w * h
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "n_px": npx,
                    "luma_sum_1000": sums,
                },
                columns=cols,
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        per_batch, STATS_SCHEMA
    )


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ]
)


def stack_frames(images: DataFrame, k: int = 4, shift: int = 17) -> DataFrame:
    """Deterministic video fixture builder: each image becomes a k-frame
    raw 'video' where frame f = (decoded_pixels + shift*f) mod 256 — a
    closed form any SQL oracle can re-derive from the synthetic pattern.
    Stays a real distributed op (stacked decode + one broadcasted add per
    (w,h,fmt) group), so the frame_sample contract query exercises the
    same mapInPandas plumbing a real demuxer would feed."""

    cols = [f.name for f in VIDEO_SCHEMA.fields]

    def per_batch(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            out_bytes: list = [None] * len(pdf)
            fshift = (np.arange(k, dtype=np.uint16) * shift)[
                None, :, None, None, None
            ]
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                pos = pdf.index.get_indexer(g.index.to_numpy())
                dec = _decode_group(g, w, h, fmt).astype(np.uint16)
                vid = ((dec[:, None] + fshift) % 256).astype(np.uint8)
                for j, p_i in enumerate(pos):
                    out_bytes[p_i] = vid[j].tobytes()
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "bytes": out_bytes,
                    "w": pdf["w"].to_numpy(),
                    "h": pdf["h"].to_numpy(),
                },
                columns=cols,
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        per_batch, VIDEO_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("luma_sum_1000", T.LongType()),
    ]
)


def frame_sample(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-as-binary frame sampling: a payload of k stacked raw frames
    (length k*h*w*3) yields every ``every_n``-th frame's luma stats. The
    UDTF-style one-to-many mapInPandas shape used for real video once a
    demuxer exists (the stub treats 'raw' multiples as the container).

    Rows are grouped by (w, h, payload length) inside each Arrow batch —
    the demux is one frombuffer reshape (n, k, h, w, 3) and the luma a
    single integer GEMM per group. ``luma_sum_1000`` = Σ 299R+587G+114B
    (exact bigint); ``mean_luma`` = that / (1000·h·w), rounded to 6."""

    cols = [f.name for f in FRAME_SCHEMA.fields]

    def per_batch(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            nb = pdf["bytes"].map(len)
            parts = []
            for (w, h, blen), g in pdf.groupby(
                [pdf["w"], pdf["h"], nb], sort=False
            ):
                frame_bytes = w * h * 3
                k = blen // frame_bytes
                if k == 0:
                    continue
                dec = np.frombuffer(
                    b"".join(b[: k * frame_bytes] for b in g["bytes"]),
                    dtype=np.uint8,
                ).reshape(len(g), k, h, w, 3)
                keep = np.arange(0, k, every_n)
                sums = (
                    dec[:, keep].astype(np.int64) @ _LUMA_INT
                ).sum(axis=(2, 3))  # (n, n_kept)
                ids = np.repeat(g["image_id"].to_numpy(), len(keep))
                fidx = np.tile(keep, len(g)).astype(np.int32)
                flat = sums.reshape(-1)
                parts.append(
                    pd.DataFrame(
                        {
                            "image_id": ids,
                            "frame_idx": fidx,
                            "mean_luma": np.round(
                                flat / (1000.0 * h * w), 6
                            ),
                            "luma_sum_1000": flat,
                        },
                        columns=cols,
                    )
                )
            yield (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame(columns=cols)
            )

    return videos.select("image_id", "bytes", "w", "h").mapInPandas(
        per_batch, FRAME_SCHEMA
    )
