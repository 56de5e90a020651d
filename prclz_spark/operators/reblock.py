"""Steiner reblocking: per block, connect every point (building analog)
to the existing road network through the parcel mesh.

Reference entry point 3 (/root/reference/reblock/i_reblock.py:231-323):
per block, parcel MULTILINESTRING → igraph; edges coincident with the
block boundary get weight 0 ('highway', existing roads —
i_topology_utils.py:197-252); each building centroid snaps onto the
nearest parcel edge as a terminal (J10 kNN insert, i_topology.py:377-434);
keep the largest connected component (i_reblock.py:41-54); compute the
2-2/t Steiner approximation over the terminals (steiner_tree.py:69-95);
split the resulting edges into existing (weight 0) vs new roads
(i_topology.py:469-486); persist per-block timing/size metrics
(i_reblock.py:152-158).

Spark shape (SURVEY.md §3.3): ``parcels ⨝ points ⨝ blocks →
repartition by block → applyInPandas(steiner_reblock)``. Work per block is
strongly size-dependent (the reference sorts small blocks first and
enforces a per-block time budget); here every block is an independent
task and a kernel-level try/except emits a status row instead of failing
the stage.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geom
from ..functions.graphops import PlanarGraph

BOUNDARY_TOL = 1e-9

REBLOCK_EDGES_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        T.StructField("edge_type", T.StringType()),  # 'existing' | 'new'
        T.StructField("ax", T.DoubleType()),
        T.StructField("ay", T.DoubleType()),
        T.StructField("bx", T.DoubleType()),
        T.StructField("by", T.DoubleType()),
        T.StructField("length", T.DoubleType()),
    ]
)

REBLOCK_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        # 0 ok | 1 error | 2 skipped (fewer than 2 terminals survive)
        # | 3 skipped (max_nodes straggler budget hit)
        T.StructField("status", T.IntegerType()),
        T.StructField("n_terminals", T.IntegerType()),
        T.StructField("n_nodes_pre", T.IntegerType()),
        T.StructField("n_edges_pre", T.IntegerType()),
        T.StructField("n_new_edges", T.IntegerType()),
        T.StructField("new_len", T.DoubleType()),
        T.StructField("existing_len", T.DoubleType()),
        T.StructField("wall_ms", T.IntegerType()),
    ]
)


def _on_boundary(p: tuple[float, float], bsegs: np.ndarray) -> bool:
    d, _, _ = geom.seg_point_distance(
        bsegs[:, 0, 0], bsegs[:, 0, 1], bsegs[:, 1, 0], bsegs[:, 1, 1],
        np.full(len(bsegs), p[0]), np.full(len(bsegs), p[1]),
    )
    return bool(d.min() <= BOUNDARY_TOL)


MAX_TERMINALS = 400  # straggler budget: the reference bounds per-block work
# with a time threshold + skip (i_reblock.py:259-273, W4); the metric
# closure is O(t² · Dijkstra) so a dense hotspot block (thousands of
# points) must be capped — terminals beyond the cap are subsampled
# deterministically (every k-th by insertion order).


def reblock_kernel(
    block_ring: np.ndarray,
    parcel_rings: list[np.ndarray],
    terminals_xy: np.ndarray,
    simplify: bool = False,
    max_terminals: int = MAX_TERMINALS,
    max_nodes: int = 20_000,
    outside_terminal: bool = True,
) -> tuple[list[tuple[str, tuple, tuple, float]], dict]:
    """One block's Steiner reblocking. Returns (edges, summary): edges as
    (edge_type, a, b, length)."""
    t0 = time.time()
    if len(terminals_xy) <= 1:
        # few-real-terminals skip (i_reblock.py:280-294): the reference
        # guards ``len(buildings) <= 1`` BEFORE synthesizing the dummy
        # outside terminal — a 1-building block is skipped, never reblocked
        # against the synthetic terminal alone.
        return [], {
            "status": 2, "n_terminals": int(len(terminals_xy)),
            "n_nodes_pre": 0, "n_edges_pre": 0,
            "n_new_edges": 0, "new_len": 0.0, "existing_len": 0.0,
            "wall_ms": int((time.time() - t0) * 1000),
        }
    if max_terminals and len(terminals_xy) > max_terminals:
        step = len(terminals_xy) / max_terminals
        idx = (np.arange(max_terminals) * step).astype(int)
        terminals_xy = np.asarray(terminals_xy)[idx]
    block_ring = geom.snap_ring(block_ring)
    g = PlanarGraph.from_polygons([geom.snap_ring(r) for r in parcel_rings])
    n_nodes_pre, n_edges_pre = g.number_of_nodes(), len(g.edges())
    if max_nodes and n_nodes_pre > max_nodes:
        # per-block work budget (reference mins_threshold, i_reblock.py:
        # 268-273): a pathological block is skipped with a status row, the
        # stage never stalls on one straggler
        return [], {
            "status": 3, "n_terminals": 0,
            "n_nodes_pre": n_nodes_pre, "n_edges_pre": n_edges_pre,
            "n_new_edges": 0, "new_len": 0.0, "existing_len": 0.0,
            "wall_ms": int((time.time() - t0) * 1000),
        }

    # edge-type weighting: both endpoints on the block boundary → existing
    # road, weight 0 (i_topology_utils.py:197-252 ε-coincidence test)
    b = block_ring
    if len(b) >= 2 and np.array_equal(b[0], b[-1]):
        b = b[:-1]
    bsegs = np.stack([b, np.roll(b, -1, axis=0)], axis=1)
    for u, v in g.edges():
        if _on_boundary(u, bsegs) and _on_boundary(v, bsegs):
            g.adj[u][v] = 0.0
            g.adj[v][u] = 0.0
            g.mark_road(u, v)

    # terminal insertion (J10): snap each point onto its nearest edge
    for p in terminals_xy:
        g.add_node_to_closest_edge((float(p[0]), float(p[1])), terminal=True)
    if outside_terminal and len(terminals_xy) >= 1:
        # synthetic 'outside' terminal (i_reblock.py:286-291): connect the
        # proposed roads to the world beyond the block — a point in the
        # min-rotated-rect of the block but outside its hull, snapped onto
        # the nearest mesh edge like any building
        op = geom.outside_point(np.asarray(block_ring, dtype=float))
        g.add_node_to_closest_edge((float(op[0]), float(op[1])), terminal=True)
    g = g.largest_component_subgraph()
    if simplify:
        g = g.simplify_degree2()
    n_terminals = sum(1 for t in g.terminal.values() if t)
    if n_terminals < 2:
        return [], {
            "status": 2, "n_terminals": n_terminals,
            "n_nodes_pre": n_nodes_pre, "n_edges_pre": n_edges_pre,
            "n_new_edges": 0, "new_len": 0.0, "existing_len": 0.0,
            "wall_ms": int((time.time() - t0) * 1000),
        }

    steiner = g.steiner_tree_approx()
    edges = []
    new_len = existing_len = 0.0
    for u, v in steiner:
        w = g.adj[u][v]
        L = float(np.hypot(u[0] - v[0], u[1] - v[1]))
        if w == 0.0:
            edges.append(("existing", u, v, L))
            existing_len += L
        else:
            edges.append(("new", u, v, L))
            new_len += L
    summary = {
        "status": 0, "n_terminals": n_terminals,
        "n_nodes_pre": n_nodes_pre, "n_edges_pre": n_edges_pre,
        "n_new_edges": sum(1 for e in edges if e[0] == "new"),
        "new_len": new_len, "existing_len": existing_len,
        "wall_ms": int((time.time() - t0) * 1000),
    }
    return edges, summary


def reblock(
    parcels: DataFrame,
    assigned_points: DataFrame,
    blocks: DataFrame,
    point_id: str = "image_id",
    emit: str = "edges",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed reblocking. ``parcels``: operators.parcel.parcelize
    output; ``assigned_points``: (block_id, point_id, lon, lat);
    ``blocks``: (block_id, geometry). ``emit``: 'edges' (steiner edge rows)
    or 'summary' (per-block metrics, the reference's timing/size columns).

    Implementation: parcels already carry block_id, so the kernel inputs
    co-group on it — the only shuffle; blocks ride the (tiny) right side
    of the cogroup."""
    # single co-grouped stream: parcel rows carry their ring (>= 3 vertices),
    # point rows a 1-vertex "ring" — disambiguated by length in the kernel
    both = parcels.select("block_id", "geometry").unionByName(
        assigned_points.select(
            "block_id",
            F.array(F.array(F.col("lon"), F.col("lat"))).alias("geometry"),
        )
    )

    def per_block(rows_pdf: pd.DataFrame, blk_pdf: pd.DataFrame) -> pd.DataFrame:
        ecols = [f.name for f in REBLOCK_EDGES_SCHEMA.fields]
        scols = [f.name for f in REBLOCK_SUMMARY_SCHEMA.fields]
        if len(blk_pdf) == 0 or len(rows_pdf) == 0:
            return pd.DataFrame(columns=ecols if emit == "edges" else scols)
        bid = blk_pdf["block_id"].iloc[0]
        ring = geom.ring_to_np(blk_pdf["geometry"].iloc[0])
        prings, pts = [], []
        for gvals in rows_pdf["geometry"]:
            arr = geom.ring_to_np(gvals)
            if len(arr) == 1:
                pts.append(arr[0])
            else:
                prings.append(arr)
        try:
            edges, summary = reblock_kernel(ring, prings, np.asarray(pts))
            summary["status"] = summary.get("status", 0)
        except Exception:
            edges, summary = [], {
                "status": 1, "n_terminals": 0, "n_nodes_pre": 0,
                "n_edges_pre": 0, "n_new_edges": 0, "new_len": 0.0,
                "existing_len": 0.0, "wall_ms": 0,
            }
        if emit == "summary":
            return pd.DataFrame([{"block_id": bid, **summary}], columns=scols)
        return pd.DataFrame(
            [
                {
                    "block_id": bid, "edge_type": et,
                    "ax": a[0], "ay": a[1], "bx": b_[0], "by": b_[1],
                    "length": L,
                }
                for et, a, b_, L in edges
            ],
            columns=ecols,
        )

    schema = REBLOCK_EDGES_SCHEMA if emit == "edges" else REBLOCK_SUMMARY_SCHEMA
    # explicit hash partition count: the Steiner kernel is the most
    # CPU-expensive stage in the engine; never let byte-based AQE
    # coalescing underparallelize it (see complexity.k_complexity)
    n = num_partitions or (
        parcels.sparkSession.sparkContext.defaultParallelism * 2
    )
    return (
        both.repartition(n, "block_id")
        .groupBy("block_id")
        .cogroup(blocks.repartition(n, "block_id").groupBy("block_id"))
        .applyInPandas(per_block, schema)
    )
