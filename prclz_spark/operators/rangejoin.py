"""Distance joins point→segment: nearest-road distance and ε-threshold
classification.

Reference semantics: the dilated-line spatial join (buffer by ε then
intersects, /root/reference/data_processing/split_lines.py:23-38 — J4) and
the distance-threshold classify (nearest line-feature type with
``dist > THRESHOLD_METERS → 'gadm_boundary'``,
reblock/i_topology_utils.py:33, 309-329 — J13). Both reduce to "distance
from point to nearest segment" with a predicate on top; buffering is
replaced by the exact distance test (buffer(ε).intersects(x) ≡
dist(x) ≤ ε — SURVEY.md §2.7 F6).

Distributed shape: segments explode to covering cells (supercover
sampling, driver-side for dimension-sized road tables); points kRing-join
the cell index; the point-segment distance is *pure Column arithmetic*
(dot-product clamp — no Python anywhere); ``min_by`` picks the winner with
the same exactness guarantee + brute-force fallback as the kNN join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells

__all__ = [
    "segments_from_lines", "segment_cover_pdf", "nearest_segment_join",
    "classify_by_distance", "boundary_types_for_blocks",
]


def segments_from_lines(lines_pdf: pd.DataFrame) -> pd.DataFrame:
    """OSM-style polylines (osm_id, highway, waterway, natural, geometry)
    → the flat segment dimension (seg_id, ax, ay, bx, by, feature_type)
    that ``segment_cover_pdf`` / ``boundary_types_for_blocks`` consume.

    feature_type replicates the reference's tag→type assignment order —
    waterway, then highway, then natural, each overriding the last
    (i_topology_utils.py:287-293) — so multi-tagged lines resolve
    identically; untagged lines default to 'highway' (weight 0)."""
    rows = []
    for r in lines_pdf.itertuples(index=False):
        ft = "highway"
        for tag in ("waterway", "highway", "natural"):
            v = getattr(r, tag, None)
            if v is not None and not (isinstance(v, float) and np.isnan(v)):
                ft = tag
        g = r.geometry
        for i in range(len(g) - 1):
            rows.append(
                {"seg_id": f"{r.osm_id}_{i}",
                 "ax": float(g[i][0]), "ay": float(g[i][1]),
                 "bx": float(g[i + 1][0]), "by": float(g[i + 1][1]),
                 "feature_type": ft}
            )
    return pd.DataFrame(
        rows, columns=["seg_id", "ax", "ay", "bx", "by", "feature_type"]
    )


def segment_cover_pdf(segments_pdf: pd.DataFrame, res: int) -> pd.DataFrame:
    """(seg_id, ax, ay, bx, by) → one row per (cell, segment): supercover
    sampling at 1/4-cell steps with 1-cell dilation so every cell within
    one cell of the segment is present (the kRing(1) join then guarantees
    candidate completeness for any point within ~1 cell of a road)."""
    nx = 1 << res
    rows = []
    for r in segments_pdf.itertuples(index=False):
        u0, v0 = (r.ax + 180.0) / 360.0 * nx, (r.ay + 90.0) / 180.0 * nx
        u1, v1 = (r.bx + 180.0) / 360.0 * nx, (r.by + 90.0) / 180.0 * nx
        n = max(1, int(np.ceil(max(abs(u1 - u0), abs(v1 - v0)) / 0.25)))
        t = np.linspace(0.0, 1.0, n + 1)
        iu = np.floor(u0 + t * (u1 - u0)).astype(np.int64)
        iv = np.floor(v0 + t * (v1 - v0)).astype(np.int64)
        cs = set()
        for du in (-1, 0, 1):
            for dv in (-1, 0, 1):
                uu = np.clip(iu + du, 0, nx - 1)
                vv = np.clip(iv + dv, 0, nx - 1)
                cs.update(
                    (res * cells.RES_BITS_SHIFT + uu * cells.XY_SHIFT + vv).tolist()
                )
        for c in cs:
            rows.append(
                {"cell": int(c), "seg_id": r.seg_id,
                 "ax": r.ax, "ay": r.ay, "bx": r.bx, "by": r.by}
            )
    return pd.DataFrame(rows)


def _seg_dist_cols():
    """Point-segment distance as Column arithmetic (F14 dot-product clamp,
    whole-stage codegen)."""
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    len2 = dx * dx + dy * dy
    t_raw = ((F.col("lon") - F.col("ax")) * dx + (F.col("lat") - F.col("ay")) * dy) / len2
    t = F.when(len2 > 0, F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))).otherwise(F.lit(0.0))
    cx = F.col("ax") + t * dx
    cy = F.col("ay") + t * dy
    return F.sqrt(
        (F.col("lon") - cx) * (F.col("lon") - cx)
        + (F.col("lat") - cy) * (F.col("lat") - cy)
    )


def nearest_segment_join(
    points: DataFrame,
    segment_cover: pd.DataFrame,
    res: int,
    point_id: str | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """(point columns..., seg_id, road_dist): exact nearest segment.
    Candidates from the kRing(1) × dilated-cover equi-join; winners whose
    distance exceeds the ring guarantee fall through to a brute-force pass
    against the broadcast segment table (few, by cover construction)."""
    spark = points.sparkSession
    pid = point_id or points.columns[0]
    cell_h = 180.0 / (1 << res)
    cov = F.broadcast(spark.createDataFrame(segment_cover))
    segs = F.broadcast(
        spark.createDataFrame(
            segment_cover.drop_duplicates("seg_id")[["seg_id", "ax", "ay", "bx", "by"]]
        )
    )
    pts = points.select(pid, lon_col, lat_col)
    dist = _seg_dist_cols()

    cand = pts.withColumn("cell", cells.cell_id(F.col(lon_col), F.col(lat_col), res)) \
        .join(cov, on="cell", how="inner")
    best = cand.groupBy(pid).agg(
        F.min_by(F.col("seg_id"), dist).alias("seg_id"),
        F.min(dist).alias("road_dist"),
    )
    # the dilated cover guarantees candidates for any point within cell_h of
    # a segment; a winner under cell_h is provably globally nearest
    sure = best.filter(F.col("road_dist") <= F.lit(cell_h))
    unresolved = pts.join(sure.select(pid), on=pid, how="left_anti")
    brute = unresolved.crossJoin(segs).groupBy(pid).agg(
        F.min_by(F.col("seg_id"), dist).alias("seg_id"),
        F.min(dist).alias("road_dist"),
    )
    return points.join(sure.unionByName(brute), on=pid)


def classify_by_distance(
    joined: DataFrame, threshold: float,
    near_label: str = "near_road", far_label: str = "off_road",
) -> DataFrame:
    """J13: label by the ε-threshold on the nearest distance (the exact
    form of the reference's buffered-intersects)."""
    return joined.withColumn(
        "road_class",
        F.when(F.col("road_dist") <= F.lit(threshold), F.lit(near_label)).otherwise(
            F.lit(far_label)
        ),
    )


def boundary_types_for_blocks(
    blocks: DataFrame,
    lines_pdf: pd.DataFrame,
    res: int,
    threshold: float = 1.0,
    geometry_col: str = "geometry",
) -> DataFrame:
    """Derive the per-boundary-segment feature types that
    ``operators.reblock`` consumes — the producer the reference builds
    from OSM lines (/root/reference/reblock/i_topology_utils.py:281-329):

    per block-boundary VERTEX, the feature type of the nearest line
    segment, falling back to ``'gadm_boundary'`` when that distance
    exceeds ``threshold`` (reference THRESHOLD_METERS=1 compared against
    a coordinate-space distance — replicated literally, the threshold is
    in the table's coordinate units); per boundary SEGMENT (vertex i →
    i+1), the endpoint types combine as: equal → that type; different →
    'highway' if either endpoint is highway else 'natural'
    (get_feature_type_from_lines, :310-329).

    ``lines_pdf``: dimension-sized pandas (seg_id, ax, ay, bx, by,
    feature_type). Returns ``blocks`` with a ``boundary_types``
    array<string> column, one entry per boundary segment of the OPEN
    ring, aligned with the ring's vertex order (what
    reblock._relabel_boundary_edges expects).

    Distributed shape: ring vertices explode JVM-side; candidates come
    from the dilated segment cover × kRing(1) equi-join (broadcast dim);
    the nearest pick is ``min(struct(round(dist, 9), seg_id))`` so
    distance ties — every shared corner vertex lies ON two grid lines —
    break deterministically toward the lowest seg_id on both the engine
    and any SQL oracle. The distance is rounded to the geometry snap
    grid (geom.SNAP = 1e-9) first: a vertex coordinate reached through a
    different float path (y0 + step vs LAT0 + 2*step) sits ~1 ulp off
    the line and would otherwise lose a d=0 tie it geometrically owns."""
    spark = blocks.sparkSession
    g0 = F.col(geometry_col)
    if len(lines_pdf) == 0:
        # no line features at all: every vertex distance exceeds the
        # threshold, so every boundary segment types as 'gadm_boundary'
        # (the reference's fallback) — one per open-ring segment.
        first0, last0 = F.element_at(g0, 1), F.element_at(g0, -1)
        closed0 = (
            (F.size(g0) > 1)
            & (first0[0] == last0[0])
            & (first0[1] == last0[1])
        )
        n_seg = F.when(closed0, F.size(g0) - 1).otherwise(F.size(g0))
        return blocks.withColumn(
            "boundary_types",
            F.transform(
                F.sequence(F.lit(1), n_seg), lambda _: F.lit("gadm_boundary")
            ),
        )
    cover = segment_cover_pdf(lines_pdf, res)
    cov = F.broadcast(spark.createDataFrame(cover))
    segs = F.broadcast(
        spark.createDataFrame(
            cover.drop_duplicates("seg_id")[["seg_id", "ax", "ay", "bx", "by"]]
        )
    )
    types = F.broadcast(
        spark.createDataFrame(lines_pdf[["seg_id", "feature_type"]])
    )
    g = F.col(geometry_col)
    first, last = F.element_at(g, 1), F.element_at(g, -1)
    closed = (F.size(g) > 1) & (first[0] == last[0]) & (first[1] == last[1])
    ring = F.when(closed, F.slice(g, 1, F.size(g) - 1)).otherwise(g)
    verts = (
        blocks.select("block_id", ring.alias("__ring"))
        .select(
            "block_id",
            F.size("__ring").alias("n"),
            F.posexplode("__ring").alias("vi", "xy"),
        )
        .select(
            "block_id", "n", "vi",
            F.col("xy")[0].alias("lon"), F.col("xy")[1].alias("lat"),
        )
    )
    dist = F.round(_seg_dist_cols(), 9)
    cell_h = 180.0 / (1 << res)
    cand = verts.withColumn(
        "cell", cells.cell_id(F.col("lon"), F.col("lat"), res)
    ).join(cov, on="cell", how="inner")
    best = cand.groupBy("block_id", "vi").agg(
        F.min(F.struct(dist.alias("d"), F.col("seg_id"))).alias("__b")
    ).select("block_id", "vi", F.col("__b.d").alias("d"), F.col("__b.seg_id").alias("seg_id"))
    sure = best.filter(F.col("d") <= F.lit(cell_h))
    unresolved = verts.join(
        sure.select("block_id", "vi"), on=["block_id", "vi"], how="left_anti"
    )
    brute = unresolved.crossJoin(segs).groupBy("block_id", "vi").agg(
        F.min(F.struct(dist.alias("d"), F.col("seg_id"))).alias("__b")
    ).select("block_id", "vi", F.col("__b.d").alias("d"), F.col("__b.seg_id").alias("seg_id"))
    vt = (
        sure.unionByName(brute)
        .join(types, on="seg_id", how="left")
        .withColumn(
            "vtype",
            F.when(F.col("d") > F.lit(threshold), F.lit("gadm_boundary")).otherwise(
                F.col("feature_type")
            ),
        )
        .join(verts.select("block_id", "vi", "n"), on=["block_id", "vi"])
        .select("block_id", "vi", "n", "vtype")
    )
    a, b = vt.alias("a"), vt.alias("b")
    seg_typed = a.join(
        b,
        (F.col("a.block_id") == F.col("b.block_id"))
        & (F.col("b.vi") == F.pmod(F.col("a.vi") + 1, F.col("a.n"))),
    ).select(
        F.col("a.block_id").alias("block_id"),
        F.col("a.vi").alias("vi"),
        F.when(F.col("a.vtype") == F.col("b.vtype"), F.col("a.vtype"))
        .when(
            (F.col("a.vtype") == "highway") | (F.col("b.vtype") == "highway"),
            F.lit("highway"),
        )
        .otherwise(F.lit("natural"))
        .alias("seg_type"),
    )
    btypes = seg_typed.groupBy("block_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vi", "seg_type"))),
            lambda s: s["seg_type"],
        ).alias("boundary_types")
    )
    return blocks.join(btypes, on="block_id", how="left")
