"""Multimodal payload tests: codec round-trips, the PSNR>=40dB + caption
fidelity gate (BASELINE.json input_hint), resize, frame sampling."""

import numpy as np
import pytest

from prclz_spark.functions import imagecodec
from prclz_spark.sources import synth


def test_raw_roundtrip_exact():
    px = synth.pixels_for_id(7, 16, 16)
    assert np.array_equal(imagecodec.decode(imagecodec.encode(px, "raw"), 16, 16, "raw"), px)


def test_q6_psnr_above_gate():
    for i in (0, 3, 11):
        px = synth.pixels_for_id(i, 16, 16)
        dec = imagecodec.decode(imagecodec.encode(px, "q6"), 16, 16, "q6")
        assert imagecodec.psnr(px, dec) >= 40.0
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 3


def test_phash_stable_under_q6():
    px = synth.pixels_for_id(5, 16, 16)
    dec = imagecodec.decode(imagecodec.encode(px, "q6"), 16, 16, "q6")
    assert imagecodec.phash64(px) == imagecodec.phash64(dec)


def test_external_format_stub():
    from prclz_spark.operators.multimodal import _decode_any

    with pytest.raises(NotImplementedError):
        _decode_any(b"\xff\xd8\xff", 4, 4, "jpeg")


@pytest.mark.slow
def test_payload_fidelity_distributed(spark):
    from prclz_spark.operators import multimodal

    img = synth.images_df(spark, 200)
    out = multimodal.payload_fidelity(img).toPandas()
    assert len(out) == 200
    assert out.fidelity_ok.all()
    assert out.caption_ok.all()
    assert out.phash_ok.all()
    raw = out[out.fmt == "raw"]
    q6 = out[out.fmt == "q6"]
    assert (raw.psnr_db == 999.0).all()            # lossless exact
    assert ((q6.psnr_db >= 40.0) & (q6.psnr_db < 999.0)).all()  # lossy >= gate


@pytest.mark.slow
def test_resize_and_frame_sample(spark):
    from prclz_spark.operators import multimodal

    img = synth.images_df(spark, 20)
    small = multimodal.resize(img, 8, 8).toPandas()
    assert (small.w == 8).all() and (small.h == 8).all()
    assert all(len(b) == 8 * 8 * 3 for b in small.bytes)
    # nearest-neighbor: resized pixel (0,0) equals source pixel (0,0)
    row = small[small.image_id == "img_000000000"].iloc[0]
    src = synth.pixels_for_id(0, 16, 16)
    got = np.frombuffer(row.bytes, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got[0, 0], src[0, 0])

    # frame sampling over a 4-frame synthetic "video" (raw frames stacked)
    import pandas as pd

    frames = [synth.pixels_for_id(i, 8, 8) for i in range(4)]
    payload = b"".join(imagecodec.encode(f, "raw") for f in frames)
    vid = spark.createDataFrame(
        pd.DataFrame([{"image_id": "vid_0", "bytes": payload, "w": 8, "h": 8}])
    )
    sampled = multimodal.frame_sample(vid, every_n=2).toPandas()
    assert list(sampled.frame_idx) == [0, 2]
    expect = float((frames[0].astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean())
    assert abs(sampled.iloc[0].mean_luma - round(expect, 6)) < 1e-9
