"""kNN join: nearest target for each point via expanding cell kRings.

The reference grows a buffer around each point until candidate edges fall
inside, then takes the argmin (add_node_to_closest_edge,
/root/reference/reblock/i_topology.py:377-434, BUF_EPS=1e-4, BUF_RATE=2).
The distributed analog (SURVEY.md §2.3 J10, north_star "H3-kNN for
nearest-parcel queries"):

1. targets are indexed by cell at ``res`` (cell, target_id, tx, ty);
2. each point explodes to its kRing(r) cells and equi-joins the index;
3. per point, ``min_by(distance)`` picks the winner;
4. points whose winner is not provably exact within ring r (the analog of
   the reference's x2 buffer growth) fall through to one brute-force pass
   against the (broadcast) target table — a single linear plan instead of
   an iterative anti-join chain, so no branch is recomputed at action time.

Guarantee: a ring-r winner is only accepted when its distance <= r * cell
edge (otherwise a nearer target could hide in ring r+1) — this makes the
result exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells


def _dist2(px, py, tx, ty):
    return (px - tx) * (px - tx) + (py - ty) * (py - ty)


def knn_join(
    points: DataFrame,
    targets: DataFrame,
    res: int,
    point_id: str | None = None,
    target_id: str = "target_id",
    ring: int = 1,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_targets: bool = True,
) -> DataFrame:
    """Nearest ``targets`` row (tx, ty) for every ``points`` row.

    Output: (point columns..., target_id, nn_dist). Exact nearest neighbor
    (see module docstring): one kRing(``ring``) candidate pass resolves the
    bulk JVM-side; the (provably few) points whose nearest target is not
    guaranteed within the ring fall through to a brute-force pass against
    the broadcast targets. Single linear plan — no iterative anti-join
    chain, so nothing is recomputed at action time.

    ``point_id``: a unique key column in ``points`` (defaults to the first
    column); grouping happens on it alone and the remaining point columns
    are re-attached with one (broadcast-friendly) join at the end.
    """
    pid = point_id or points.columns[0]
    # guarantee radius in degrees: a ring-r winner is exact when its
    # distance <= r * (lat cell height) — the tightest escape distance out
    # of the (2r+1)^2 block (lon cells are 2x wider, so this is conservative)
    cell_h = 180.0 / (1 << res)

    tgt = targets.withColumn("__tcell", cells.cell_id(F.col("tx"), F.col("ty"), res))
    if broadcast_targets:
        tgt = F.broadcast(tgt)

    pts = points.select(pid, lon_col, lat_col)
    d2 = _dist2(F.col(lon_col), F.col(lat_col), F.col("tx"), F.col("ty"))

    # tie-break: equidistant targets resolve to the LOWER target id (the
    # struct orders field-wise), matching SQL's `order by d2, target_id`
    order_key = F.struct(d2.alias("d"), F.col(target_id).alias("t"))

    cand = pts.withColumn(
        "__cell",
        F.explode(cells.kring_cells(F.col(lon_col), F.col(lat_col), res, ring)),
    ).join(tgt, F.col("__cell") == F.col("__tcell"), "inner")
    best = cand.groupBy(pid).agg(
        F.min_by(F.col(target_id), order_key).alias(target_id),
        F.sqrt(F.min(d2)).alias("nn_dist"),
    )
    sure = best.filter(F.col("nn_dist") <= F.lit(ring * cell_h))

    unresolved = pts.join(sure.select(pid), on=pid, how="left_anti")
    brute = unresolved.crossJoin(tgt.drop("__tcell")).groupBy(pid).agg(
        F.min_by(F.col(target_id), order_key).alias(target_id),
        F.sqrt(F.min(d2)).alias("nn_dist"),
    )
    return points.join(sure.unionByName(brute), on=pid)


def parcel_assign(
    points: DataFrame,
    anchors: DataFrame,
    res: int,
    point_id: str,
    anchor_id: str = "anchor_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_anchors: bool = True,
) -> DataFrame:
    """Voronoi-parcel membership for a second point set: each point's
    parcel is the Voronoi cell of the nearest anchor WITHIN the point's
    containing block (parcelize semantics; north_star 'H3-kNN for
    nearest-parcel queries').

    Inputs both carry ``block_id``: ``points`` (id, block_id, lon, lat),
    ``anchors`` (anchor_id, block_id, ax, ay). Output: (point columns...,
    anchor_id, nn_dist).

    Two-phase EXACT plan (a naive per-block points x anchors join is
    quadratic in the hot urban block — the skew trap):

    1. fast path: global exact NN via knn_join (kRing candidates + ring
       guarantee); ACCEPT a winner whose block matches the point's —
       the bulk, since a cross-block global winner needs the point
       within anchor-spacing distance of a block border;
    2. fallback: only the border-sliver residue joins its OWN block's
       anchors (bounded by per-block anchor count) with the same
       deterministic (dist², anchor_id) argmin.

    Both phases and the SQL oracle share one total order, so ties are
    engine-independent."""
    pts = points.select(point_id, "block_id", lon_col, lat_col)
    tgt = anchors.select(
        F.col(anchor_id).alias("__aid"),
        F.col("block_id").alias("__ablock"),
        F.col("ax").alias("tx"),
        F.col("ay").alias("ty"),
    )
    nn = knn_join(
        pts,
        tgt.select("__aid", "tx", "ty"),
        res,
        point_id=point_id,
        target_id="__aid",
        lon_col=lon_col,
        lat_col=lat_col,
        broadcast_targets=broadcast_anchors,
    )
    ablocks = tgt.select("__aid", "__ablock")
    if broadcast_anchors:
        ablocks = F.broadcast(ablocks)
    nn = nn.join(ablocks, "__aid")
    sure = nn.filter(F.col("__ablock") == F.col("block_id")).select(
        point_id, F.col("__aid").alias(anchor_id), "nn_dist"
    )

    resid = pts.join(sure.select(point_id), point_id, "left_anti")
    a = anchors.select(
        F.col(anchor_id).alias("__aid"), "block_id", "ax", "ay"
    )
    if broadcast_anchors:
        a = F.broadcast(a)
    d2 = _dist2(F.col(lon_col), F.col(lat_col), F.col("ax"), F.col("ay"))
    order_key = F.struct(d2.alias("d"), F.col("__aid").alias("t"))
    fb = (
        resid.join(a, "block_id")
        .groupBy(point_id)
        .agg(
            F.min_by(F.col("__aid"), order_key).alias(anchor_id),
            F.sqrt(F.min(d2)).alias("nn_dist"),
        )
    )
    return points.join(sure.unionByName(fb), point_id)
