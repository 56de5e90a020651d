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


def payload_fidelity(images: DataFrame, psnr_floor: float = 40.0) -> DataFrame:
    """Per-row fidelity vs the deterministic source imagery: decode the
    payload, re-synthesize the reference pixels from the row id, compare.
    PSNR of exact matches reports as 999.0 (inf is not Parquet-friendly)."""

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                i = int(r.image_id.split("_")[1])
                ref = synth.pixels_for_id(i, r.w, r.h)
                dec = _decode_any(r.bytes, r.w, r.h, r.fmt)
                if r.fmt == "q6":
                    ref = imagecodec.decode(
                        imagecodec.encode(ref, "q6"), r.w, r.h, "q6"
                    )  # the stored payload IS the quantized image; compare
                    # decoded-vs-requantized for exactness, PSNR vs original
                    p = imagecodec.psnr(synth.pixels_for_id(i, r.w, r.h), dec)
                    exact = np.array_equal(dec, ref)
                else:
                    p = imagecodec.psnr(ref, dec)
                    exact = np.array_equal(dec, ref)
                psnr_db = 999.0 if np.isinf(p) else float(p)
                cap_ok = r.caption == f"synthetic caption {r.image_id}"
                ph_ok = imagecodec.phash64(dec) == r.phash
                rows.append(
                    (
                        r.image_id, r.fmt, round(psnr_db, 6), bool(cap_ok),
                        bool(ph_ok),
                        bool(cap_ok and ph_ok and exact and psnr_db >= psnr_floor),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FIDELITY_SCHEMA.fields],
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


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resample (pure numpy index grid) re-encoded as
    'raw'. The standard image-tower preprocessing step at table scale:
    one mapInPandas pass, output partitioning inherited from input."""

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = _decode_any(r.bytes, r.w, r.h, r.fmt)
                ys = (np.arange(out_h) * r.h // out_h).astype(int)
                xs = (np.arange(out_w) * r.w // out_w).astype(int)
                out = px[ys][:, xs]
                rows.append(
                    (r.image_id, imagecodec.encode(out, "raw"), out_w, out_h, "raw")
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        per_batch, RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def frame_sample(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-as-binary frame sampling: a payload of k stacked raw frames
    (length k*h*w*3) yields every ``every_n``-th frame's mean luma. The
    UDTF-style one-to-many mapInPandas shape used for real video once a
    demuxer exists (the stub treats 'raw' multiples as the container)."""

    def per_batch(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frame_bytes = r.w * r.h * 3
                k = len(r.bytes) // frame_bytes
                for f in range(0, k, every_n):
                    px = np.frombuffer(
                        r.bytes[f * frame_bytes:(f + 1) * frame_bytes], dtype=np.uint8
                    ).reshape(r.h, r.w, 3)
                    luma = float(
                        (px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean()
                    )
                    rows.append((r.image_id, f, round(luma, 6)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return videos.select("image_id", "bytes", "w", "h").mapInPandas(
        per_batch, FRAME_SCHEMA
    )
