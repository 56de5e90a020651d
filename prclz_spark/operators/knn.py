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

    cand = pts.withColumn(
        "__cell",
        F.explode(cells.kring_cells(F.col(lon_col), F.col(lat_col), res, ring)),
    ).join(tgt, F.col("__cell") == F.col("__tcell"), "inner")
    best = cand.groupBy(pid).agg(
        F.min_by(F.col(target_id), d2).alias(target_id),
        F.sqrt(F.min(d2)).alias("nn_dist"),
    )
    sure = best.filter(F.col("nn_dist") <= F.lit(ring * cell_h))

    unresolved = pts.join(sure.select(pid), on=pid, how="left_anti")
    brute = unresolved.crossJoin(tgt.drop("__tcell")).groupBy(pid).agg(
        F.min_by(F.col(target_id), d2).alias(target_id),
        F.sqrt(F.min(d2)).alias("nn_dist"),
    )
    return points.join(sure.unionByName(brute), on=pid)
