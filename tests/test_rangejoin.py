"""Distance-join tests (J4 dilated-line join / J13 threshold classify —
/root/reference/data_processing/split_lines.py:23-38,
reblock/i_topology_utils.py:309-329)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from prclz_spark.operators import rangejoin
from prclz_spark.sources import synth


def _grid_segments(g: int, jitter: float = 0.0) -> pd.DataFrame:
    roads = synth.road_grid_lines(g, jitter=jitter)
    roads = roads[roads.highway.notna()]
    rows = []
    for r in roads.itertuples(index=False):
        for i in range(len(r.geometry) - 1):
            rows.append(
                {"seg_id": f"{r.osm_id}_{i}",
                 "ax": r.geometry[i][0], "ay": r.geometry[i][1],
                 "bx": r.geometry[i + 1][0], "by": r.geometry[i + 1][1]}
            )
    return pd.DataFrame(rows)


def test_segment_cover_dilated():
    segs = pd.DataFrame(
        [{"seg_id": "s", "ax": 10.0, "ay": 50.0, "bx": 10.01, "by": 50.0}]
    )
    cov = rangejoin.segment_cover_pdf(segs, 14)
    assert len(cov) >= 9  # at least the 3x3 dilation of one cell
    assert set(cov.columns) == {"cell", "seg_id", "ax", "ay", "bx", "by"}


@pytest.mark.slow
def test_nearest_segment_matches_bruteforce(spark):
    g = 4
    segs = _grid_segments(g)
    cover = rangejoin.segment_cover_pdf(segs, 13)
    base = spark.range(0, 500, numPartitions=4)
    lon, lat = synth.lonlat_cols(F.col("id"))
    pts = base.select(F.col("id").alias("pid"), lon.alias("lon"), lat.alias("lat"))
    out = rangejoin.nearest_segment_join(pts, cover, 13).toPandas()
    assert len(out) == 500

    # numpy brute-force oracle
    a = segs[["ax", "ay"]].to_numpy()
    b = segs[["bx", "by"]].to_numpy()
    p = out[["lon", "lat"]].to_numpy()
    d_ab = b - a
    len2 = (d_ab**2).sum(1)
    for i in range(len(p)):
        t = np.clip(((p[i] - a) * d_ab).sum(1) / len2, 0, 1)
        c = a + t[:, None] * d_ab
        d = np.hypot(*(p[i] - c).T)
        assert abs(out.road_dist.iloc[i] - d.min()) < 1e-12


@pytest.mark.slow
def test_classify_threshold(spark):
    segs = _grid_segments(4)
    cover = rangejoin.segment_cover_pdf(segs, 13)
    base = spark.range(0, 300, numPartitions=4)
    lon, lat = synth.lonlat_cols(F.col("id"))
    pts = base.select(F.col("id").alias("pid"), lon.alias("lon"), lat.alias("lat"))
    joined = rangejoin.nearest_segment_join(pts, cover, 13)
    out = rangejoin.classify_by_distance(joined, 0.005).toPandas()
    near = out[out.road_class == "near_road"]
    far = out[out.road_class == "off_road"]
    assert (near.road_dist <= 0.005).all()
    assert (far.road_dist > 0.005).all()
    assert len(near) > 0 and len(far) > 0


def test_parcel_assign_border_fallback_and_ties(spark):
    """parcel_assign: a point whose GLOBAL nearest anchor sits across the
    block border must fall back to its own block's anchors (exact
    in-block argmin), and equidistant in-block anchors resolve to the
    lower anchor id on every path."""
    import pandas as pd

    from prclz_spark.operators import knn as knn_op

    # two blocks side by side; point P in block L at x=0.9 — global NN is
    # anchor R0 in block R (x=1.1, d=0.2) but its parcel owner is L's
    # nearest anchor (x=0.5, d=0.4)
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": [1, 2],
        "block_id": ["L", "L"],
        "lon": [0.9, 0.5],
        "lat": [10.5, 10.5],
    }))
    anchors = spark.createDataFrame(pd.DataFrame({
        "anchor_id": ["a_mid", "a_far", "r0", "z_mid"],
        "block_id": ["L", "L", "R", "L"],
        "ax": [0.5, 0.1, 1.1, 0.5],
        "ay": [10.5, 10.5, 10.5, 10.5],
    }))
    out = (
        knn_op.parcel_assign(pts, anchors, 12, point_id="pid")
        .toPandas().set_index("pid")
    )
    # P1: global NN r0 is out-of-block -> fallback -> a_mid (0.4 < 0.8)
    assert out.loc[1, "anchor_id"] == "a_mid"
    assert abs(out.loc[1, "nn_dist"] - 0.4) < 1e-12
    # P2 sits ON a_mid == z_mid position: tie resolves to lower id
    assert out.loc[2, "anchor_id"] == "a_mid"
