"""Parcelization: Voronoi-decompose each block on its assigned points.

Reference stage 3 (/root/reference/prclz/parcelization/
midway_parcelization.R:44-91): densify building footprints, Voronoi-
tessellate the block, dissolve cells by footprint id, emit the cell mesh
as a MULTILINESTRING parcel layer per block. In the graft the building
role is played by image points (SURVEY.md §1.4), so a parcel is the
clipped Voronoi cell of one point — the dissolve step is the identity —
and the mesh is the union of cell boundaries.

Spark shape: ``assigned points → groupBy(block) cogroup blocks →
applyInPandas(voronoi_clip)``; one shuffle, kernels pure numpy
(functions.voronoi halfplane cells + Sutherland–Hodgman clip, the same
pair complexity.py's S0 uses, so parcels and k-complexity agree)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geom
from ..functions.voronoi import halfplane_voronoi_cell

PARCELS_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        T.StructField("parcel_point_id", T.StringType()),
        T.StructField("geometry", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("area", T.DoubleType()),
    ]
)


def block_parcels(
    block_ring: np.ndarray,
    point_ids: list[str],
    pts_xy: np.ndarray,
) -> list[tuple[str, np.ndarray]]:
    """Clipped Voronoi cell per point; duplicates perturbed
    deterministically like the Voronoi module."""
    pts = np.array(pts_xy, dtype=float)
    seen: dict[tuple[float, float], int] = {}
    for i in range(len(pts)):
        key = (pts[i, 0], pts[i, 1])
        if key in seen:
            seen[key] += 1
            pts[i] += 1e-9 * seen[key]
        else:
            seen[key] = 0
    x0, y0, x1, y1 = geom.ring_bounds(block_ring)
    m = max(x1 - x0, y1 - y0, 1e-9)
    frame = np.array(
        [[x0 - m, y0 - m], [x1 + m, y0 - m], [x1 + m, y1 + m], [x0 - m, y1 + m]]
    )
    out = []
    for i in range(len(pts)):
        cell = halfplane_voronoi_cell(i, pts, frame)
        if len(cell) < 3:
            continue
        clipped = geom.clip_polygon_convex(block_ring, cell)
        if len(clipped) >= 3 and geom.ring_area(clipped) > 0:
            out.append((point_ids[i], clipped))
    return out


def parcelize(
    assigned_points: DataFrame,
    blocks: DataFrame,
    point_id: str = "image_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(block_id, parcel_point_id, geometry, area): one parcel per
    assigned point. ``assigned_points``: (block_id, point_id, lon, lat);
    ``blocks``: (block_id, geometry ring). Pre-hash-partitioned with an
    explicit count so AQE's size-based coalescing cannot starve the
    CPU-heavy kernel (see complexity.k_complexity)."""

    def per_block(pts_pdf: pd.DataFrame, blk_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in PARCELS_SCHEMA.fields]
        if len(blk_pdf) == 0 or len(pts_pdf) == 0:
            return pd.DataFrame(columns=cols)
        bid = blk_pdf["block_id"].iloc[0]
        ring = geom.ring_to_np(blk_pdf["geometry"].iloc[0])
        ids = [str(v) for v in pts_pdf[point_id]]
        xy = np.column_stack([pts_pdf["lon"].to_numpy(), pts_pdf["lat"].to_numpy()])
        try:
            cells_out = block_parcels(ring, ids, xy)
        except Exception:
            cells_out = []  # fault isolation, never fail the stage
        rows = [
            {
                "block_id": bid,
                "parcel_point_id": pid,
                "geometry": [[float(x), float(y)] for x, y in cell],
                "area": geom.ring_area(cell),
            }
            for pid, cell in cells_out
        ]
        return pd.DataFrame(rows, columns=cols)

    n = num_partitions or (
        assigned_points.sparkSession.sparkContext.defaultParallelism * 2
    )
    pts = assigned_points.select("block_id", point_id, "lon", "lat").repartition(
        n, "block_id"
    )
    return (
        pts.groupBy("block_id")
        .cogroup(blocks.repartition(n, "block_id").groupBy("block_id"))
        .applyInPandas(per_block, PARCELS_SCHEMA)
    )


def parcel_stats(parcels: DataFrame) -> DataFrame:
    """Per-block parcel summary (count + area checks): the area sum of a
    block's parcels equals the block area — the partition-of-unity
    invariant pinned in tests."""
    return parcels.groupBy("block_id").agg(
        F.count("*").alias("n_parcels"),
        F.sum("area").alias("total_area"),
    )
