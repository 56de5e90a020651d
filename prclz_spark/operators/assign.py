"""Spatial-join operators: point-in-polygon assignment, largest-overlap,
with explicit skew handling.

The reference's workhorse is ``gpd.sjoin(points, polygons, op='within')``
(/root/reference/prclz/utils.py:73, reblock/i_topology_utils.py:147) — an
in-memory rtree. The distributed re-expression (SURVEY.md §2.3 J1) is a
**two-stage join**:

1. *cell equi-join prefilter* — every point gets its integer cell id
   (JVM-side arithmetic, ``functions.cells``); every polygon is exploded to
   its covering cell set. The join on ``cell`` is a plain equi-join
   Catalyst can broadcast (small dim) or shuffle (large dim, AQE
   skew-split).
2. *exact refine* — surviving (point, polygon) candidates pass through an
   Arrow-vectorized ray-cast PIP kernel, batched per polygon so each
   polygon's ring is converted to numpy once per batch, not per row.

Skew: dense urban cells concentrate candidates. Three levers, all explicit:
``res`` (smaller cells spread hot spots), optional *salting* (replicate the
polygon side k ways, point side picks a deterministic salt — the
north_rule's "salted two-stage join"), and AQE skew-join splitting which is
on by default (session.py).

At 10^12 rows the point side is never shuffled for the broadcast variant —
the only wide exchange is the final aggregation, and
``repartitionByRange(cell_prefix)`` co-locates neighborhoods for
downstream stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions import cells, geom

RING_TYPE = T.ArrayType(T.ArrayType(T.DoubleType()))


# ---------------------------------------------------------------------------
# polygon cover dimension
# ---------------------------------------------------------------------------

def block_cover_pdf(blocks_pdf: pd.DataFrame, res: int) -> pd.DataFrame:
    """Explode (block_id, geometry ring) → (cell, block_id, geometry,
    interior): one row per covering cell. Driver-side for the small
    dimension path.

    ``interior`` is True when the cell rectangle lies entirely inside the
    polygon — points landing there are assigned by the equi-join alone,
    no exact-PIP refine (the standard covering-with-containment-flag
    optimization; the reference's rtree gives only a maybe-set, SURVEY.md
    §2.3 J1). At fine ``res`` the interior share approaches 1 - O(1/√cells)
    so the Python refine touches only a boundary sliver."""
    frames = []
    for r in blocks_pdf.itertuples(index=False):
        ring = geom.ring_to_np(r.geometry)
        ids, interior = cells.cover_cells_classified(ring, res)
        frames.append(pd.DataFrame({
            "cell": ids,
            "block_id": r.block_id,
            "geometry": [r.geometry] * len(ids),
            "interior": interior,
        }))
    return pd.concat(frames, ignore_index=True)


def block_cover_df(spark: SparkSession, blocks: DataFrame, res: int) -> DataFrame:
    """Distributed cover explode for large polygon tables (mapInPandas —
    no driver materialization)."""
    schema = T.StructType(
        [
            T.StructField("cell", T.LongType()),
            T.StructField("block_id", T.StringType()),
            T.StructField("geometry", RING_TYPE),
        ]
    )

    def explode_covers(batches):
        for pdf in batches:
            yield block_cover_pdf(pdf, res)

    return blocks.mapInPandas(explode_covers, schema)


# ---------------------------------------------------------------------------
# PIP refine kernel
# ---------------------------------------------------------------------------

@pandas_udf(T.BooleanType())
def _pip_udf(lon: pd.Series, lat: pd.Series, block_id: pd.Series, ring: pd.Series) -> pd.Series:
    """Batched PIP: group by block_id so each ring hits numpy once per
    batch; then one vectorized ray-cast per polygon over all its points."""
    out = np.zeros(len(lon), dtype=bool)
    lon_v, lat_v = lon.to_numpy(), lat.to_numpy()
    for bid, idx in pd.Series(range(len(block_id))).groupby(block_id.to_numpy()).groups.items():
        ii = np.asarray(idx)
        r = geom.ring_to_np(ring.iloc[ii[0]])
        out[ii] = geom.points_in_polygon(lon_v[ii], lat_v[ii], r)
    return pd.Series(out)


# ---------------------------------------------------------------------------
# the operator
# ---------------------------------------------------------------------------

def assign_points_to_blocks(
    points: DataFrame,
    cover,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    how: str = "inner",
    broadcast_cover: bool = True,
    salt: int = 0,
) -> DataFrame:
    """Assign each point row its containing block_id.

    ``points``: any DataFrame with lon/lat columns. ``cover``: the exploded
    (cell, block_id, geometry[, interior]) dimension — a *pandas* DataFrame
    (block_cover_pdf) takes the small-dimension fast path (no geometry ever
    crosses Arrow: interior cells resolve JVM-side, boundary rings ride a
    task broadcast), a Spark DataFrame takes the distributed path. ``how``:
    'inner' keeps matched points (sjoin op='within'), 'left' keeps all
    (sjoin how='left', utils.py:73).

    salt > 0 (distributed path) replicates each cover row ``salt`` ways and
    routes each point deterministically to one replica — spreads a hot cell
    across `salt` tasks in the shuffle-join path.
    """
    if isinstance(cover, pd.DataFrame):
        refined = _assign_small_cover(points, cover, res, lon_col, lat_col)
    else:
        refined = _assign_dist_cover(
            points, cover, res, lon_col, lat_col, broadcast_cover, salt
        )
    if how == "inner":
        return refined
    if how == "left":
        matched = refined.select(*points.columns, "block_id")
        return points.join(
            matched.select(points.columns[0], "block_id"), on=points.columns[0], how="left"
        )
    raise ValueError(how)


def _ring_pip_udf(spark, cover_pdf: pd.DataFrame):
    """Exact ray-cast refine for boundary-cell candidates: rings resolved
    from an executor broadcast keyed by block_id — the Arrow frame carries
    primitives only."""
    rings = {
        r.block_id: geom.ring_to_np(r.geometry)
        for r in cover_pdf.drop_duplicates("block_id").itertuples(index=False)
    }
    bc = spark.sparkContext.broadcast(rings)

    @pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, block_id: pd.Series) -> pd.Series:
        ring_map = bc.value
        out = np.zeros(len(lon), dtype=bool)
        lon_v, lat_v = lon.to_numpy(), lat.to_numpy()
        codes, uniques = pd.factorize(block_id)
        for k, bid in enumerate(uniques):
            ii = np.nonzero(codes == k)[0]
            out[ii] = geom.points_in_polygon(lon_v[ii], lat_v[ii], ring_map[bid])
        return pd.Series(out)

    return pip


def _assign_small_cover(
    points: DataFrame, cover_pdf: pd.DataFrame, res: int, lon_col: str, lat_col: str
) -> DataFrame:
    """Small-dimension path. Split the cover by the ``interior`` flag:
    points in interior cells are assigned by the broadcast equi-join alone
    (whole-stage codegen, zero Python); only boundary-cell candidates pass
    the exact ray-cast (_ring_pip_udf)."""
    spark = points.sparkSession
    if "interior" not in cover_pdf.columns:
        cover_pdf = cover_pdf.assign(interior=False)
    cov_df = F.broadcast(
        spark.createDataFrame(cover_pdf[["cell", "block_id", "interior"]])
    )
    pip = _ring_pip_udf(spark, cover_pdf)

    pt = points.withColumn("cell", cells.cell_id(F.col(lon_col), F.col(lat_col), res))
    cand = pt.join(cov_df, on="cell", how="inner")
    inner = cand.filter(F.col("interior"))
    boundary = cand.filter(~F.col("interior")).filter(
        pip(F.col(lon_col), F.col(lat_col), F.col("block_id"))
    )
    return inner.unionByName(boundary).drop("cell", "interior")


def compact_cover_pdf(
    cover_pdf: pd.DataFrame, res: int, res_min: int
) -> pd.DataFrame:
    """Compact a classified cover's INTERIOR cells per block through the
    quadtree (cells.compact_cells_np) — boundary cells stay at ``res``
    (they gate the exact-PIP refine and must not merge across the flag).
    Interior flags are area properties, so promoting a complete 4-sibling
    interior group preserves the assignment semantics cell-for-cell."""
    if "interior" not in cover_pdf.columns:
        # unclassified covers are legal for the classic path; here every
        # cell is boundary, so there is nothing to compact
        cover_pdf = cover_pdf.assign(interior=False)
    inner = cover_pdf[cover_pdf["interior"]]
    frames = [cover_pdf[~cover_pdf["interior"]]]
    for bid, g in inner.groupby("block_id", sort=False):
        ids = cells.compact_cells_np(g["cell"].to_numpy(), res, res_min)
        frames.append(
            pd.DataFrame(
                {
                    "cell": ids,
                    "block_id": bid,
                    "geometry": [g["geometry"].iloc[0]] * len(ids),
                    "interior": True,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def assign_points_to_blocks_compact(
    points: DataFrame,
    cover_pdf: pd.DataFrame,
    res: int,
    res_min: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    compacted_pdf: pd.DataFrame | None = None,
) -> DataFrame:
    """The H3 production shape of the two-stage PIP join: polyfill →
    compact → join the point's ANCESTOR-CELL ARRAY against the compacted
    cover. Row-identical to assign_points_to_blocks on the same cover
    (pinned in tests/test_cells_compact.py): compacted interior cells are
    pairwise disjoint and ⊆ their block, so a point still matches at most
    one interior row — just possibly at a coarser level — and boundary
    cells stay at ``res`` feeding the same exact ray-cast.

    Cost model: the fact side explodes K+1 = res - res_min + 1 ancestor
    ids per point (closed-form Column arithmetic — floor(u·2^r)//2 ==
    floor(u·2^(r-1)), so each level is an independent cell_id call that
    stays in codegen); the dimension side shrinks up to 4^K on large
    aligned interiors. Worth it exactly when the cover would otherwise
    blow the broadcast budget (continent-scale AOIs at fine res) — for
    small covers prefer the plain single-cell join.

    ``compacted_pdf``: a cover already passed through compact_cover_pdf
    with the same (res, res_min) — callers that need the compacted row
    count for stage metrics (pipeline.run_pipeline) compact once and
    hand it in instead of paying the quadtree fold twice."""
    assert 0 <= res_min <= res, (res, res_min)
    spark = points.sparkSession
    comp = (
        compacted_pdf
        if compacted_pdf is not None
        else compact_cover_pdf(cover_pdf, res, res_min)
    )
    cov_df = F.broadcast(
        spark.createDataFrame(comp[["cell", "block_id", "interior"]])
    )
    pip = _ring_pip_udf(spark, cover_pdf)

    ancestors = F.array(
        *[
            cells.cell_id(F.col(lon_col), F.col(lat_col), r)
            for r in range(res, res_min - 1, -1)
        ]
    )
    pt = points.withColumn("cell", F.explode(ancestors))
    cand = pt.join(cov_df, on="cell", how="inner")
    inner = cand.filter(F.col("interior"))
    boundary = cand.filter(~F.col("interior")).filter(
        pip(F.col(lon_col), F.col(lat_col), F.col("block_id"))
    )
    return inner.unionByName(boundary).drop("cell", "interior")


def _assign_dist_cover(
    points: DataFrame,
    cover: DataFrame,
    res: int,
    lon_col: str,
    lat_col: str,
    broadcast_cover: bool,
    salt: int,
) -> DataFrame:
    """Distributed-cover path (large polygon dimension): geometry rides the
    join as a column; optional salting spreads hot cells."""
    pt = points.withColumn("cell", cells.cell_id(F.col(lon_col), F.col(lat_col), res))
    cov = cover
    has_interior = "interior" in cover.columns
    if salt > 0:
        cov = cov.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        pt = pt.withColumn("__salt", F.pmod(F.xxhash64(F.col(lon_col)), F.lit(salt)))
        join_keys = ["cell", "__salt"]
    else:
        join_keys = ["cell"]
    if broadcast_cover:
        cov = F.broadcast(cov)
    cand = pt.join(cov, on=join_keys, how="inner")
    drop_cols = ["geometry", "cell", "__salt"]
    if has_interior:
        inner = cand.filter(F.col("interior"))
        boundary = cand.filter(~F.col("interior")).filter(
            _pip_udf(F.col(lon_col), F.col(lat_col), F.col("block_id"), F.col("geometry"))
        )
        return inner.unionByName(boundary).drop(*drop_cols, "interior")
    return cand.filter(
        _pip_udf(F.col(lon_col), F.col(lat_col), F.col("block_id"), F.col("geometry"))
    ).drop(*drop_cols)


def largest_overlap_assign(
    features: DataFrame,
    cover: DataFrame,
    res: int,
    feature_id: str = "osm_id",
    geometry_col: str = "geometry",
    broadcast_cover: bool = True,
    block_geoms: DataFrame | None = None,
) -> DataFrame:
    """J5 (midway_parcelization.R:116 `st_join(..., largest=TRUE)`): assign
    each polygonal feature to the block with which it overlaps most.
    Candidates by cell join on the feature centroid's kRing-1 cells, exact
    intersection-area kernel, argmax via window row_number — the Spark
    shape prescribed in SURVEY.md §2.3 J5.

    Pass ``block_geoms`` (block_id, geometry — one row per block) to keep
    the ``cover`` frame narrow (cell, block_id): replicating the ring
    geometry onto every covering cell row makes the dimension frame
    orders of magnitude heavier to ship/broadcast for zero information."""
    from pyspark.sql import Window

    from ..functions import geomcols

    # centroid is pure Column arithmetic (geomcols) — the former
    # mapInPandas stage paid ~9 s / 20k rows in nested-array Arrow
    # round-trips before any work happened
    feats = geomcols.with_ring_centroid(
        features.select(feature_id, F.col(geometry_col).alias("geometry"))
    )
    # bound form: the centroid columns are big HOF trees the optimizer
    # inlines into every kring site — the plain form re-evaluates them
    # ~2*(2k+1)^2 times per row (measured 10 s/20k rows at sf0.1)
    feats_cells = feats.withColumn(
        "cell",
        F.explode(cells.kring_cells_bound(F.col("lon"), F.col("lat"), res, 1)),
    )
    # candidate (feature, block) pairs: dedupe on NARROW id columns only —
    # deduping rows that carry nested-array geometries forces a slow
    # object-based aggregate — then re-attach both geometries.
    cov_ids = cover.select("cell", "block_id")
    if block_geoms is not None:
        blocks_geo = block_geoms.select(
            "block_id", F.col("geometry").alias("block_geometry")
        )
    else:
        blocks_geo = cover.select(
            "block_id", F.col("geometry").alias("block_geometry")
        ).dropDuplicates(["block_id"])
    if broadcast_cover:
        cov_ids = F.broadcast(cov_ids)
    # explicit-count exchange on the dedupe keys: the pair frame is
    # byte-tiny (two ids), so AQE would coalesce its shuffle to a handful
    # of tasks. Fine for the rect fast path, but the non-convex fallback
    # downstream is a CPU-heavy Arrow kernel that inherits THIS
    # partitioning (the geometry joins are broadcasts) and must run wide —
    # the CLAUDE.md cogroup invariant. Same keys as the dedupe, so the
    # aggregate reuses the exchange: one shuffle total.
    n_part = features.sparkSession.sparkContext.defaultParallelism * 2
    pair_ids = (
        feats_cells.select(feature_id, "cell")
        .join(cov_ids, on="cell", how="inner")
        .select(feature_id, "block_id")
        .repartition(n_part, feature_id, "block_id")
        .dropDuplicates([feature_id, "block_id"])
    )
    # bbox + axis-rect flags, all Column arithmetic: rect×rect pairs (the
    # dominant case for footprint squares over grid blocks) score as a
    # clamped product in codegen. The nested ring columns still ride the
    # (JVM) joins, but are NULLED before the Arrow boundary for rect
    # pairs — nested-array Arrow serialization is ~350µs/row and must
    # never touch the bulk path, while a null ships for free. One linear
    # plan: branching into a rect/non-rect union would re-execute the
    # whole candidate subtree (scan→explode→join→dedupe) once per branch.
    feats_all = geomcols.with_ring_bounds_rect(feats, "geometry", "f_").select(
        feature_id, "geometry", "f_x0", "f_y0", "f_x1", "f_y1", "f_rect"
    )
    blocks_all = geomcols.with_ring_bounds_rect(blocks_geo, "block_geometry", "b_")
    if broadcast_cover:
        blocks_all = F.broadcast(blocks_all)
    cand = pair_ids.join(feats_all, on=feature_id).join(blocks_all, on="block_id")
    ow = F.least("f_x1", "b_x1") - F.greatest("f_x0", "b_x0")
    oh = F.least("f_y1", "b_y1") - F.greatest("f_y0", "b_y0")
    is_rect = F.col("f_rect") & F.col("b_rect")
    g_in = F.when(is_rect, F.lit(None).cast(RING_TYPE)).otherwise(F.col("geometry"))
    bg_in = F.when(is_rect, F.lit(None).cast(RING_TYPE)).otherwise(
        F.col("block_geometry")
    )

    @pandas_udf(T.DoubleType())
    def overlap_area(feat_geom: pd.Series, block_id: pd.Series, block_geom: pd.Series) -> pd.Series:
        """|feature ∩ block| per candidate pair, three tiers:

        1. axis-rect × axis-rect → closed-form clamped product, numpy-
           vectorized over the whole block group (the dominant case for
           footprint-style squares — no per-pair Python at all);
        2. convex block → one Sutherland–Hodgman clip per pair (area is
           exact for ANY simple feature when the CLIPPER is convex);
        3. non-convex block → signed-triangle-fan ``intersection_area``
           (exact for arbitrary simple polygons, disconnected overlaps
           included — shapely .intersection semantics,
           midway_parcelization.R:116)."""
        n = len(feat_geom)
        out = np.zeros(n)
        # rect×rect rows arrive with geometry nulled (scored JVM-side)
        valid = feat_geom.notna() & block_geom.notna()
        frings = {i: geom.ring_to_np(feat_geom.iloc[i]) for i in np.nonzero(valid.to_numpy())[0]}
        if not frings:
            return pd.Series(out)
        fb = np.zeros((n, 4))
        frect = np.zeros(n, bool)
        for i, r in frings.items():
            fb[i] = geom.ring_bounds(r)
            frect[i] = geom.is_axis_rect(r)
        codes, uniques = pd.factorize(block_id.where(valid))
        for k in range(len(uniques)):
            ii = np.nonzero(codes == k)[0]
            bring = geom.ring_to_np(block_geom.iloc[ii[0]])  # parse once/block
            bx0, by0, bx1, by1 = geom.ring_bounds(bring)
            # bbox reject for the whole group (overlap provably 0)
            w = np.minimum(fb[ii, 2], bx1) - np.maximum(fb[ii, 0], bx0)
            h = np.minimum(fb[ii, 3], by1) - np.maximum(fb[ii, 1], by0)
            live = ii[(w > 0) & (h > 0)]
            if geom.is_axis_rect(bring):
                rr = live[frect[live]]
                if len(rr):
                    out[rr] = (
                        np.minimum(fb[rr, 2], bx1) - np.maximum(fb[rr, 0], bx0)
                    ) * (np.minimum(fb[rr, 3], by1) - np.maximum(fb[rr, 1], by0))
                rest = live[~frect[live]]
            else:
                rest = live
            if len(rest) == 0:
                continue
            if geom.is_convex_ring(bring):
                for i in rest:
                    clipped = geom.clip_polygon_convex(frings[i], bring)
                    out[i] = geom.ring_area(clipped) if len(clipped) >= 3 else 0.0
            else:
                for i in rest:
                    out[i] = geom.intersection_area(frings[i], bring)
        return pd.Series(out)

    scored = cand.withColumn(
        "overlap",
        F.when(is_rect, F.greatest(ow, F.lit(0.0)) * F.greatest(oh, F.lit(0.0)))
        .otherwise(overlap_area(g_in, F.col("block_id"), bg_in)),
    ).select(feature_id, "block_id", "overlap")
    w = Window.partitionBy(feature_id).orderBy(F.desc("overlap"), F.asc("block_id"))
    # the >0 filter runs AFTER the argmax: filtering first would force the
    # UDF to evaluate twice (once in the Filter, once in the Project); a
    # zero-overlap winner means every candidate was zero — same rows out
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("overlap") > 0))
        .select(feature_id, "block_id", "overlap")
    )


def repartition_by_cell_prefix(
    df: DataFrame, res: int, prefix_res: int, num_partitions: int | None = None,
    lon_col: str = "lon", lat_col: str = "lat",
) -> DataFrame:
    """north_rule: 'explicit repartitionByRange on cell prefix' — co-locate
    whole neighborhoods so downstream per-block stages shuffle nothing."""
    pref = cells.cell_prefix(cells.cell_id(F.col(lon_col), F.col(lat_col), res), res, prefix_res)
    df = df.withColumn("cell_prefix", pref)
    if num_partitions:
        return df.repartitionByRange(num_partitions, "cell_prefix")
    return df.repartitionByRange("cell_prefix")
