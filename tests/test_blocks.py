"""Block extraction tests: polygonization of the road arrangement with
canonical id minting (reference entry point 1 —
/root/reference/midway/midway_blocks.py:51-82, prclz/blocks/methods.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from prclz_spark.functions import geom
from prclz_spark.operators import blocks
from prclz_spark.sources import synth


def _aoi_ring():
    return np.array(
        [
            [synth.AOI_LON0, synth.AOI_LAT0],
            [synth.AOI_LON0 + synth.AOI_SPAN, synth.AOI_LAT0],
            [synth.AOI_LON0 + synth.AOI_SPAN, synth.AOI_LAT0 + synth.AOI_SPAN],
            [synth.AOI_LON0, synth.AOI_LAT0 + synth.AOI_SPAN],
        ]
    )


def test_node_segments_cross():
    # two segments crossing at the origin → 4 half-segments sharing a node
    segs = np.array(
        [[[-1.0, 0.0], [1.0, 0.0]], [[0.0, -1.0], [0.0, 1.0]]]
    )
    noded = blocks.node_segments(segs)
    assert len(noded) == 4
    nodes = {n for e in noded for n in e}
    assert (0.0, 0.0) in nodes


def test_node_segments_t_touch():
    segs = np.array(
        [[[-1.0, 0.0], [1.0, 0.0]], [[0.5, 0.0], [0.5, 1.0]]]
    )
    noded = blocks.node_segments(segs)
    # horizontal split at the T; vertical unchanged
    assert len(noded) == 3


@pytest.mark.parametrize("jitter", [0.0, 0.3, 0.8])
def test_polygonize_grid_faces(jitter):
    g = 5
    roads = synth.road_grid_lines(g, jitter=jitter)
    lines = [geom.ring_to_np(x) for x in roads[roads.highway.notna()].geometry]
    rings = blocks.polygonize_lines(lines, _aoi_ring())
    assert len(rings) == g * g
    total = sum(geom.ring_area(r) for r in rings)
    assert abs(total - synth.AOI_SPAN**2) < 1e-9


def test_mint_ids_row_major_on_grid():
    roads = synth.road_grid_lines(3, jitter=0.0)
    lines = [geom.ring_to_np(x) for x in roads[roads.highway.notna()].geometry]
    rings = blocks.polygonize_lines(lines, _aoi_ring())
    minted = blocks.mint_block_ids(rings, "r")
    assert [b for b, _ in minted] == [f"r_{i}" for i in range(9)]
    # id 0 = bottom-left, id 2 = bottom-right, id 8 = top-right (row-major)
    step = synth.AOI_SPAN / 3
    for idx, (gx, gy) in [(0, (0, 0)), (2, (2, 0)), (8, (2, 2))]:
        x0, y0, _, _ = geom.ring_bounds(minted[idx][1])
        assert abs(x0 - (synth.AOI_LON0 + gx * step)) < 1e-9
        assert abs(y0 - (synth.AOI_LAT0 + gy * step)) < 1e-9


def test_mint_ids_parallelism_invariant():
    """Same faces in any input order → same ids (north_rule determinism)."""
    roads = synth.road_grid_lines(4, jitter=0.5)
    lines = [geom.ring_to_np(x) for x in roads[roads.highway.notna()].geometry]
    rings = blocks.polygonize_lines(lines, _aoi_ring())
    a = blocks.mint_block_ids(rings, "r")
    b = blocks.mint_block_ids(rings[::-1], "r")
    for (ida, ra), (idb, rb) in zip(a, b):
        assert ida == idb
        assert abs(geom.ring_area(ra) - geom.ring_area(rb)) < 1e-15


@pytest.mark.slow
def test_extract_blocks_distributed(spark):
    g = 4
    roads = synth.road_grid_lines(g, jitter=0.4)
    roads = roads[roads.highway.notna()][["osm_id", "geometry"]].copy()
    roads["region_id"] = "city"
    lines = spark.createDataFrame(roads)
    regions = spark.createDataFrame(
        pd.DataFrame([{"region_id": "city", "geometry": _aoi_ring().tolist()}])
    )
    out = blocks.extract_blocks(lines, regions).toPandas()
    assert len(out) == g * g
    assert sorted(out.block_id) == sorted(f"city_{i}" for i in range(g * g))
    # every face inside the AOI bbox
    assert (out.x0 >= synth.AOI_LON0 - 1e-9).all()
    assert (out.y1 <= synth.AOI_LAT0 + synth.AOI_SPAN + 1e-9).all()
    # ids stable across a different shuffle/partitioning of the input
    out2 = blocks.extract_blocks(lines.repartition(7), regions).toPandas()
    m1 = out.sort_values("block_id")[["block_id", "x0", "y0"]].reset_index(drop=True)
    m2 = out2.sort_values("block_id")[["block_id", "x0", "y0"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(m1, m2)
