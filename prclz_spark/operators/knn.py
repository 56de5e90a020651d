"""kNN join: nearest target for each point via expanding cell kRings.

The reference grows a buffer around each point until candidate edges fall
inside, then takes the argmin (add_node_to_closest_edge,
/root/reference/reblock/i_topology.py:377-434, BUF_EPS=1e-4, BUF_RATE=2).
The distributed analog (SURVEY.md §2.3 J10, north_star "H3-kNN for
nearest-parcel queries"):

1. targets are indexed by cell at ``res`` (cell, target_id, tx, ty);
2. each point explodes to its kRing(r) cells and equi-joins the index;
3. per point, ``min_by(distance)`` picks the winner;
4. points with no candidate in ring r escalate to ring 2r (the reference's
   x2 buffer growth) — an iterative anti-join loop; a final brute-force
   pass against the (broadcast) target table catches stragglers.

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
    point_id: str = "point_id",
    target_id: str = "target_id",
    max_ring: int = 4,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_targets: bool = True,
) -> DataFrame:
    """Nearest ``targets`` row (tx, ty) for every ``points`` row.

    Output: (point columns..., target_id, nn_dist). Exact nearest neighbor
    (see module docstring). Targets are expected dimension-sized (blocks /
    parcel centroids); the point side streams through unshuffled in the
    broadcast path.
    """
    # guarantee radius per ring count, in degrees (use the smaller axis
    # step: lat cells are 180/2^res tall, lon 360/2^res wide)
    cell_h = 180.0 / (1 << res)

    tgt = targets.withColumn("__tcell", cells.cell_id(F.col("tx"), F.col("ty"), res))
    if broadcast_targets:
        tgt = F.broadcast(tgt)

    remaining = points
    resolved = None
    ring = 1
    while ring <= max_ring:
        cand = remaining.withColumn(
            "__cell",
            F.explode(cells.kring_cells(F.col(lon_col), F.col(lat_col), res, ring)),
        ).join(tgt, F.col("__cell") == F.col("__tcell"), "inner")
        d2 = _dist2(F.col(lon_col), F.col(lat_col), F.col("tx"), F.col("ty"))
        best = (
            cand.groupBy(*[F.col(c) for c in points.columns])
            .agg(
                F.min_by(F.col(target_id), d2).alias(target_id),
                F.sqrt(F.min(d2)).alias("nn_dist"),
            )
        )
        # accept only provably-exact winners: dist <= ring * cell_h means no
        # target outside the ring can be closer
        guarantee = F.lit(ring * cell_h)
        sure = best.filter(F.col("nn_dist") <= guarantee)
        resolved = sure if resolved is None else resolved.unionByName(sure)
        remaining = remaining.join(
            sure.select(*points.columns), on=points.columns, how="left_anti"
        )
        ring *= 2

    # brute-force the stragglers (few, by construction) against all targets
    brute_cand = remaining.crossJoin(tgt.drop("__tcell"))
    d2 = _dist2(F.col(lon_col), F.col(lat_col), F.col("tx"), F.col("ty"))
    brute = brute_cand.groupBy(*[F.col(c) for c in points.columns]).agg(
        F.min_by(F.col(target_id), d2).alias(target_id),
        F.sqrt(F.min(d2)).alias("nn_dist"),
    )
    return resolved.unionByName(brute)
