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


# ---------------------------------------------------------------------------
# Distributed segment-cover path (fact-sized roads)
# ---------------------------------------------------------------------------


def test_segments_from_lines_df_parity(spark):
    """The distributed flatten must reproduce the driver builder exactly —
    ids, coordinates, AND the last-non-null tag-override order (waterway <
    highway < natural; untagged -> 'highway')."""
    lines = pd.DataFrame([
        {"osm_id": "w0", "highway": "residential", "waterway": None,
         "natural": None, "geometry": [[10.0, 50.0], [10.1, 50.0], [10.1, 50.1]]},
        {"osm_id": "w1", "highway": "primary", "waterway": "stream",
         "natural": None, "geometry": [[10.0, 50.2], [10.2, 50.2]]},
        {"osm_id": "w2", "highway": "x", "waterway": "y", "natural": "coast",
         "geometry": [[10.0, 50.3], [10.2, 50.3]]},
        {"osm_id": "w3", "highway": None, "waterway": None, "natural": None,
         "geometry": [[10.0, 50.4], [10.2, 50.4]]},
        # degenerate: 1-vertex and null geometry must yield ZERO segments
        # (not a sequence(0,-1) element_at crash), like the pandas twin
        {"osm_id": "w4", "highway": "residential", "waterway": None,
         "natural": None, "geometry": [[10.0, 50.5]]},
        {"osm_id": "w5", "highway": "residential", "waterway": None,
         "natural": None, "geometry": None},
    ])
    want = rangejoin.segments_from_lines(lines).sort_values("seg_id").reset_index(drop=True)
    got = (
        rangejoin.segments_from_lines_df(spark.createDataFrame(lines))
        .toPandas().sort_values("seg_id").reset_index(drop=True)[want.columns]
    )
    pd.testing.assert_frame_equal(want, got)


def test_segment_cover_df_parity(spark):
    """Column-side supercover emits the IDENTICAL (cell, seg_id) set as
    the driver pandas builder (same linspace arithmetic, same dilation),
    on jittered general-position segments."""
    segs = _grid_segments(6, jitter=0.4)
    want = rangejoin.segment_cover_pdf(segs, 13)
    got = rangejoin.segment_cover_df(spark.createDataFrame(segs), 13).toPandas()
    sa = set(map(tuple, want[["cell", "seg_id"]].itertuples(index=False)))
    sb = set(map(tuple, got[["cell", "seg_id"]].itertuples(index=False)))
    assert sa == sb


def test_distributed_join_matches_legacy_with_residue(spark):
    """nearest_segment_join_distributed == the broadcast path row-for-row,
    including a far outlier that is residue at the caller's resolution
    (drained by the auto-appended coarser levels, not a cartesian)."""
    segs = _grid_segments(4, jitter=0.3)
    cover = rangejoin.segment_cover_pdf(segs, 13)
    base = spark.range(0, 800, numPartitions=4)
    lon, lat = synth.lonlat_cols(F.col("id"))
    pts = base.select(F.col("id").alias("pid"), lon.alias("lon"), lat.alias("lat"))
    pts = pts.unionByName(spark.createDataFrame(
        pd.DataFrame({"pid": [99999], "lon": [-150.0], "lat": [-70.0]})
    ))
    legacy = rangejoin.nearest_segment_join(pts, cover, 13)
    dist = rangejoin.nearest_segment_join_distributed(
        pts, spark.createDataFrame(segs), 13, point_id="pid"
    )
    a = sorted(map(tuple, legacy.select("pid", F.round("road_dist", 9)).collect()))
    b = sorted(map(tuple, dist.select("pid", F.round("road_dist", 9)).collect()))
    assert a == b and len(b) == 801
    p = dist._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # fully JVM-side: the distributed path has no Python stage at all
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_star_junction_hot_cell_guard(spark):
    """Degenerate skew fixture: N roads all through ONE junction point, so
    one cell (and its ring) holds every segment. The hot-cell guard must
    split the cell into hash chunks (bounded per-key candidate count) and
    stay EXACT — identical output with the guard on, off, and vs the
    legacy broadcast path."""
    rng = np.random.default_rng(7)
    n = 120
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(0.02, 0.05, n)
    jx, jy = 10.05, 50.05  # the junction
    segs = pd.DataFrame({
        "seg_id": [f"s{i}" for i in range(n)],
        "ax": jx, "ay": jy,
        "bx": jx + r * np.cos(ang), "by": jy + r * np.sin(ang),
    })
    base = spark.range(0, 400, numPartitions=4)
    pts = base.select(
        F.col("id").alias("pid"),
        (F.lit(jx) + (F.pmod(F.col("id") * 37, F.lit(100)) - 50) / 500.0).alias("lon"),
        (F.lit(jy) + (F.pmod(F.col("id") * 53, F.lit(100)) - 50) / 500.0).alias("lat"),
    )
    sdf = spark.createDataFrame(segs)
    res = 12  # coarse enough that the junction cell holds all n segments
    cov = rangejoin.segment_cover_df(sdf, res).toPandas()
    hot = cov.groupby("cell").size().max()
    assert hot == n  # the fixture IS degenerate: one cell holds every segment

    cap = 16
    guarded = rangejoin.nearest_segment_join_distributed(
        pts, sdf, res, point_id="pid", max_segs_per_cell=cap
    )
    unguarded = rangejoin.nearest_segment_join_distributed(
        pts, sdf, res, point_id="pid", max_segs_per_cell=None
    )
    legacy = rangejoin.nearest_segment_join(
        pts, rangejoin.segment_cover_pdf(segs, res), res, point_id="pid"
    )
    g = sorted(map(tuple, guarded.select("pid", F.round("road_dist", 9)).collect()))
    u = sorted(map(tuple, unguarded.select("pid", F.round("road_dist", 9)).collect()))
    l = sorted(map(tuple, legacy.select("pid", F.round("road_dist", 9)).collect()))
    assert g == u == l and len(g) == 400

    # the bounded per-key property: with the guard, every (cell, chunk)
    # join key holds ~cap segments (hash-balanced), never the full hot
    # cell — recompute the guard's own chunking and measure the max key
    nb = int(np.ceil(hot / cap))
    assert nb > 1
    key_sizes = (
        rangejoin.segment_cover_df(sdf, res)
        .groupBy("cell")
        .agg(F.count("*").alias("cn"), F.collect_list("seg_id").alias("ids"))
        .select(
            "cell",
            F.explode("ids").alias("seg_id"),
            F.ceil(F.col("cn") / F.lit(cap)).cast("int").alias("nb"),
        )
        .withColumn("chunk", F.pmod(F.xxhash64("seg_id"), F.col("nb")))
        .groupBy("cell", "chunk")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert key_sizes <= 3 * cap  # hash-balanced, far below the hot cell's n
