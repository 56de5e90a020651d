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
        # geometry-true multi-ring clip (non-convex block ∩ cell can be
        # disconnected; see complexity.s0_from_block). The piece holding
        # the generating point keeps the point id — terminals pair with
        # their parcel by id in reblock — and detached pieces get a
        # "#k" suffix so their edges still enter the parcel mesh.
        pieces = [
            p for p in geom.polygon_intersection(block_ring, cell)
            if len(p) >= 3 and geom.ring_area(p) > 0
        ]
        if not pieces:
            continue
        if len(pieces) == 1:
            out.append((point_ids[i], pieces[0]))
            continue
        own = [
            j for j, p in enumerate(pieces)
            if geom.point_in_polygon(pts[i, 0], pts[i, 1], p)
        ]
        main = own[0] if own else int(np.argmax([geom.ring_area(p) for p in pieces]))
        out.append((point_ids[i], pieces[main]))
        out.extend(
            (f"{point_ids[i]}#{j}", p)
            for j, p in enumerate(pieces) if j != main
        )
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


# ---------------------------------------------------------------------------
# footprint parcelization (A4 dissolve + F12 densification)
# ---------------------------------------------------------------------------

FOOTPRINT_PARCELS_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        T.StructField("parcel_id", T.StringType()),
        T.StructField("n_cells", T.IntegerType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("ptdist_used", T.DoubleType()),  # -1.0 = boundary fallback
    ]
)

FALLBACK_PARCEL_ID = "__block_boundary__"


def block_parcels_footprint(
    block_ring: np.ndarray,
    fp_ids: list[str],
    fp_rings: list[np.ndarray],
    ptdist: float,
    max_anchors: int = 20_000,
) -> list[tuple[str, int, float]]:
    """One block's footprint parcelization (midway_parcelization.R:62-76):
    densify every footprint boundary at ``ptdist`` (st_segmentize), Voronoi-
    tessellate the block on the densified points, dissolve cells by
    footprint id. Returns [(fp_id, n_cells, dissolved_area)].

    Because cells are disjoint and exactly partition the block, the
    dissolved area is the sum of the member cells' areas — no polygon
    union is computed (the union's *boundary*, when needed for a mesh
    sink, is the member cells' non-shared edges). Raises when the anchor
    budget is exceeded, which the retry ladder converts into a coarser
    ``ptdist`` attempt."""
    # budget is enforced BEFORE densifying (perimeter/ptdist estimate) and
    # again while accumulating, so a pathological ptdist raises in O(1)
    # instead of materializing millions of anchors first
    est = 0.0
    for ring in fp_rings:
        r = np.asarray(ring, dtype=float)
        if len(r) >= 2:
            closed = np.vstack([r, r[:1]])
            est += float(np.hypot(*(np.diff(closed, axis=0).T)).sum()) / ptdist
    if est > max_anchors:
        raise ValueError(
            f"footprint densification would produce ~{int(est)} anchors "
            f"(> {max_anchors}) at ptdist={ptdist}"
        )
    anchors: list[tuple[float, float]] = []
    labels: list[int] = []
    for k, ring in enumerate(fp_rings):
        r = np.asarray(ring, dtype=float)
        if len(r) < 2:
            anchors.append((float(r[0, 0]), float(r[0, 1])))
            labels.append(k)
            continue
        closed = np.vstack([r, r[:1]]) if not np.array_equal(r[0], r[-1]) else r
        dens = geom.segmentize(closed, ptdist)[:-1]  # drop repeated first
        for p in dens:
            anchors.append((float(p[0]), float(p[1])))
            labels.append(k)
        if len(anchors) > max_anchors:
            raise ValueError(
                f"footprint densification produced {len(anchors)} anchors "
                f"(> {max_anchors}) at ptdist={ptdist}"
            )
    pts = np.asarray(anchors, dtype=float)
    # deterministic perturbation of exact duplicates (shared footprint
    # corners / overlapping rings), same scheme as the Voronoi module
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
    agg_area: dict[int, float] = {}
    agg_cells: dict[int, int] = {}
    for i in range(len(pts)):
        cell = halfplane_voronoi_cell(i, pts, frame)
        if len(cell) < 3:
            continue
        # area-only path: SH with a convex clipper is exact for any simple
        # subject — disconnected-overlap bridge edges are traversed once in
        # each direction and cancel in the shoelace sum
        clipped = geom.clip_polygon_convex(block_ring, cell)
        if len(clipped) >= 3:
            a = geom.ring_area(clipped)
            if a > 0:
                k = labels[i]
                agg_area[k] = agg_area.get(k, 0.0) + a
                agg_cells[k] = agg_cells.get(k, 0) + 1
    return [(fp_ids[k], agg_cells[k], agg_area[k]) for k in sorted(agg_area)]


def parcelize_footprints(
    assigned_points: DataFrame,
    blocks: DataFrame,
    footprint_side: float,
    ptdist: float,
    point_id: str = "image_id",
    coarse_factor: float = 100.0,
    num_partitions: int | None = None,
    max_anchors: int = 6_000,
) -> DataFrame:
    """Distributed footprint parcelization with the reference's retry
    ladder (midway_parcelization.R:126-135): per block, try the fine
    ``ptdist``; on failure retry at ``ptdist * coarse_factor``; if both
    fail, inherit the block boundary as a single fallback parcel
    (parcel_id '__block_boundary__', ptdist_used -1).

    ``max_anchors`` is the per-block straggler budget: the Voronoi kernel
    is O(n² log n) in anchors, so a hotspot block (30% of points in 1.5%
    of the area in the synthetic skew) must densify coarsely — exceeding
    the budget at the fine rung is precisely what drops it to the coarse
    rung, the reference's own ptdist ladder motivation.

    Footprints are squares of side ``footprint_side`` centered on each
    assigned point (the graft's building-footprint analog — the same
    model the tiling operator uses). Output:
    (block_id, parcel_id, n_cells, area, ptdist_used)."""

    def per_block(pts_pdf: pd.DataFrame, blk_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in FOOTPRINT_PARCELS_SCHEMA.fields]
        if len(blk_pdf) == 0 or len(pts_pdf) == 0:
            return pd.DataFrame(columns=cols)
        bid = blk_pdf["block_id"].iloc[0]
        ring = geom.ring_to_np(blk_pdf["geometry"].iloc[0])
        # canonical order: independent of cogroup arrival order
        pts_pdf = pts_pdf.sort_values(point_id)
        ids = [str(v) for v in pts_pdf[point_id]]
        xy = np.column_stack(
            [pts_pdf["lon"].to_numpy(), pts_pdf["lat"].to_numpy()]
        )
        h = footprint_side / 2.0
        rings = [
            np.array(
                [[x - h, y - h], [x + h, y - h], [x + h, y + h], [x - h, y + h]]
            )
            for x, y in xy
        ]
        for d in (ptdist, ptdist * coarse_factor):
            try:
                out = block_parcels_footprint(ring, ids, rings, d, max_anchors)
            except Exception:
                continue
            if out:
                return pd.DataFrame(
                    [
                        {"block_id": bid, "parcel_id": pid, "n_cells": nc,
                         "area": a, "ptdist_used": float(d)}
                        for pid, nc, a in out
                    ],
                    columns=cols,
                )
        # inherit-block-boundary fallback: the whole block as one parcel
        return pd.DataFrame(
            [{"block_id": bid, "parcel_id": FALLBACK_PARCEL_ID, "n_cells": 1,
              "area": geom.ring_area(geom.snap_ring(ring)),
              "ptdist_used": -1.0}],
            columns=cols,
        )

    n = num_partitions or (
        assigned_points.sparkSession.sparkContext.defaultParallelism * 2
    )
    pts = assigned_points.select("block_id", point_id, "lon", "lat").repartition(
        n, "block_id"
    )
    return (
        pts.groupBy("block_id")
        .cogroup(
            blocks.select("block_id", "geometry")
            .repartition(n, "block_id")
            .groupBy("block_id")
        )
        .applyInPandas(per_block, FOOTPRINT_PARCELS_SCHEMA)
    )


def parcel_stats(parcels: DataFrame) -> DataFrame:
    """Per-block parcel summary (count + area checks): the area sum of a
    block's parcels equals the block area — the partition-of-unity
    invariant pinned in tests."""
    return parcels.groupBy("block_id").agg(
        F.count("*").alias("n_parcels"),
        F.sum("area").alias("total_area"),
    )
