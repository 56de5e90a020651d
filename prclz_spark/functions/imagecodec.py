"""Image payload codec: lossless 'raw' + lossy 'q6' formats, PSNR, phash.

The graft's input rows carry encoded pixels in a ``bytes binary`` column
(BASELINE.json input_hint). No image libraries exist in this environment
(SURVEY.md §7.1), so payloads are synthesized in two numpy-decodable
formats:

- ``raw``: row-major uint8 RGB, exactly ``h*w*3`` bytes (lossless —
  decoded-pixel check is exact equality / allclose).
- ``q6``: 6-bit/channel quantization, same length (lossy — exercises the
  PSNR >= 40 dB fidelity gate; max abs error 3/255 ⇒ PSNR ≈ 44 dB).

These run batch-at-a-time over numpy within mapInPandas; real decoders
(JPEG/PNG) would slot in behind decode() with the same Spark-side plumbing
(schema, batching, partitioning) — see operators.multimodal.
"""

from __future__ import annotations

import numpy as np


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8."""
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "q6":
        return (pixels >> 2).astype(np.uint8).tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    if fmt == "raw":
        return arr.reshape(h, w, 3)
    if fmt == "q6":
        q = arr.reshape(h, w, 3)
        # expand 6-bit code to full range: (q << 2) | (q >> 4)
        return ((q.astype(np.uint16) << 2) | (q.astype(np.uint16) >> 4)).astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual-hash stand-in (FIXTURES.md §1): average-hash over
    an 8x8 luma downsample — stable under the q6 quantization."""
    h, w, _ = pixels.shape
    luma = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                                xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > np.median(blocks)).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # to signed int64
    return val - (1 << 64) if val >= (1 << 63) else val
