"""CSV-with-WKT source tests (S3/F1 — reference csv_to_geo,
/root/reference/prclz/utils.py:26-43)."""

import numpy as np
import pytest

from prclz_spark.sources import synth, wkt


def test_wkt_roundtrip():
    ring = [[10.0, 50.0], [10.1, 50.0], [10.1, 50.1], [10.0, 50.1]]
    s = wkt.ring_to_wkt(ring)
    assert s.startswith("POLYGON ((") and s.count(",") == 4  # closed ring
    back = wkt.parse_wkt_ring(s)
    assert back == ring  # closing vertex dropped on parse


def test_parse_scientific_and_negative():
    s = "LINESTRING (-1.5e-3 2, 3 -4.25)"
    assert wkt.parse_wkt_ring(s) == [[-0.0015, 2.0], [3.0, -4.25]]


@pytest.mark.slow
def test_read_wkt_csv_and_uniqueness(spark, tmp_path):
    p = tmp_path / "blocks.csv"
    blocks = synth.grid_blocks(3)
    with open(p, "w") as f:
        f.write("block_id,geometry\n")
        for r in blocks.itertuples(index=False):
            f.write(f'{r.block_id},"{wkt.ring_to_wkt(r.geometry)}"\n')
    df = wkt.read_wkt_csv(spark, str(p))
    out = df.select("block_id", "geometry_ring").toPandas()
    assert len(out) == 9
    from prclz_spark.functions import geom

    ring0 = geom.ring_to_np(out[out.block_id == "city_0"].geometry_ring.iloc[0])
    assert ring0.shape == (4, 2)
    np.testing.assert_allclose(ring0[0], [synth.AOI_LON0, synth.AOI_LAT0])

    # duplicate id → the uniqueness gate raises before any downstream stage
    with open(p, "a") as f:
        f.write(f'city_0,"{wkt.ring_to_wkt(blocks.geometry.iloc[0])}"\n')
    with pytest.raises(ValueError, match="duplicate"):
        wkt.read_wkt_csv(spark, str(p))
