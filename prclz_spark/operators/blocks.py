"""Street-block extraction: polygonize the road arrangement per region.

Reference lifecycle (/root/reference/midway/midway_blocks.py:51-82 →
prclz/blocks/methods.py:35-40): per GADM region, union the road
linestrings, buffer by ε, subtract from the region polygon; every
resulting polygon is a block with id ``{region}_{i}`` minted in iteration
order (midway_blocks.py:37-39).

We implement the ε→0 equivalent the reference itself ships as an
alternative (methods.py:43-106 `polygonize`; SURVEY.md §7.4): node the
road segments, trace the planar-arrangement faces, keep faces inside the
region. Distributed shape (SURVEY.md §3.1):

    lines ⨝_cell regions → groupBy(region_id) → applyInPandas(polygonize)

Id determinism (north_rule: identical output at any parallelism): the
reference's enumeration order is file order — not reproducible under
shuffling — so faces are minted under the explicit total order
(min-y, min-x, area) before enumeration (SURVEY.md §7.3 step 4). On an
axis-aligned grid this is row-major, which the SQL oracle can restate in
closed form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geom
from ..functions.graphops import PlanarGraph

SNAP = 1e-9  # coordinate snap (~0.1mm): makes computed intersections between
# float paths coincide exactly, the kernel analog of shapely's fixed-precision


def _snap(v: np.ndarray) -> np.ndarray:
    return np.round(v / SNAP) * SNAP


def node_segments(segs: np.ndarray) -> list[tuple[tuple, tuple]]:
    """Planar noding: split every segment at its intersections with every
    other (proper crossings and T-touches). O(m²) pair tests, vectorized
    per segment; m is per-region (10²-10³), never global."""
    m = len(segs)
    if m == 0:
        return []
    a = segs[:, 0]  # (m,2)
    b = segs[:, 1]
    d = b - a
    cut_ts: list[list[float]] = [[] for _ in range(m)]
    for i in range(m):
        # r x s cross products against all later segments, vectorized
        js = np.arange(i + 1, m)
        if len(js) == 0:
            continue
        r = d[i]
        s = d[js]
        qp = a[js] - a[i]
        rxs = r[0] * s[:, 1] - r[1] * s[:, 0]
        qpxr = qp[:, 0] * r[1] - qp[:, 1] * r[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / rxs
            u = qpxr / rxs
        ok = (np.abs(rxs) > 1e-18) & (t >= -1e-12) & (t <= 1 + 1e-12) \
            & (u >= -1e-12) & (u <= 1 + 1e-12)
        for k in np.nonzero(ok)[0]:
            j = int(js[k])
            cut_ts[i].append(float(t[k]))
            cut_ts[j].append(float(u[k]))
    out: list[tuple[tuple, tuple]] = []
    for i in range(m):
        ts = sorted(set([0.0, 1.0] + [min(1.0, max(0.0, t)) for t in cut_ts[i]]))
        pts = _snap(a[i] + np.outer(ts, d[i]))
        for p, q in zip(pts[:-1], pts[1:]):
            tp, tq = (float(p[0]), float(p[1])), (float(q[0]), float(q[1]))
            if tp != tq:
                out.append((tp, tq))
    return out


def _prune_dangling(
    edges: list[tuple[tuple, tuple]]
) -> list[tuple[tuple, tuple]]:
    """Iteratively drop edges with a degree-1 endpoint: dead-end road
    spurs bound no face — without the prune the face trace walks a spur
    out-and-back and emits it as a degenerate zero-area 'block'
    (tests/test_buffered_difference.py caught phantom blocks on the
    dead-end family). The reference's buffered difference agrees: a spur
    only notches its enclosing block, it never splits one
    (/root/reference/prclz/blocks/methods.py:35-40). Every edge lying on
    a cycle survives, so real faces are untouched.

    Degrees count DEDUPLICATED undirected edges: duplicate/overlapping
    input polylines would otherwise give a spur's free endpoint degree 2
    and let the whisker survive the prune (first-occurrence order kept,
    so face-trace insertion order stays deterministic)."""
    from collections import Counter

    seen: dict[tuple, None] = {}
    for u, v in edges:
        key = (u, v) if u <= v else (v, u)
        if key not in seen:
            seen[key] = None
    edges = [k for k in seen]
    while True:
        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        kept = [e for e in edges if deg[e[0]] > 1 and deg[e[1]] > 1]
        if len(kept) == len(edges):
            return edges
        edges = kept


def polygonize_lines(lines: list[np.ndarray], region_ring: np.ndarray | None = None
                     ) -> list[np.ndarray]:
    """Faces of the arrangement of ``lines``, optionally restricted to
    faces whose centroid lies inside ``region_ring``. Pure-numpy analog of
    shapely.ops.polygonize (prclz/blocks/methods.py:85,
    reblock/i_reblock.py:177)."""
    segs = []
    for line in lines:
        arr = _snap(np.asarray(line, dtype=float))
        for p, q in zip(arr[:-1], arr[1:]):
            if not np.array_equal(p, q):
                segs.append((p, q))
    if not segs:
        return []
    noded = node_segments(np.asarray(segs))
    noded = _prune_dangling(noded)
    if not noded:
        return []
    g = PlanarGraph()
    for u, v in noded:
        g.add_edge(u, v)
    faces = g.trace_faces()
    rings = [np.asarray(f, dtype=float) for f in faces]
    if region_ring is not None:
        kept = []
        for r in rings:
            cx, cy = geom.ring_centroid(r)
            if geom.point_in_polygon(cx, cy, region_ring):
                kept.append(r)
        rings = kept
    return rings


def _canonical_ring_key(r: np.ndarray) -> tuple:
    """Full deterministic tiebreak for faces that tie on the rounded
    (min-y, min-x, area) key: the ring's vertex tuple, rotated so the
    lexicographically-smallest vertex leads and oriented toward the
    smaller of the two traversals — identical regardless of which vertex
    the face trace happened to start from."""
    vs = [(round(float(x), 9), round(float(y), 9)) for x, y in r]
    if len(vs) >= 2 and vs[0] == vs[-1]:
        vs = vs[:-1]
    if not vs:
        return ()
    # the minimum vertex can occur MORE THAN ONCE (pinched/self-touching
    # face) — consider every occurrence as a rotation start in both
    # directions, else the key would depend on the trace's starting point
    lo = min(vs)
    best = None
    for i, v in enumerate(vs):
        if v != lo:
            continue
        fwd = tuple(vs[i:] + vs[:i])
        rev = tuple(vs[i::-1] + vs[:i:-1])
        cand = min(fwd, rev)
        if best is None or cand < best:
            best = cand
    return best


def mint_block_ids(rings: list[np.ndarray], region_id: str
                   ) -> list[tuple[str, np.ndarray]]:
    """Canonical (min-y, min-x, area, canonical-vertex-tuple) total order
    → '{region}_{i}'. The vertex-tuple tail guarantees a strict total
    order even when two distinct faces tie on the rounded scalar key, so
    ids never depend on shuffle/partition order."""
    keyed = []
    for r in rings:
        x0, y0, _, _ = geom.ring_bounds(r)
        keyed.append(
            (round(y0, 9), round(x0, 9), round(geom.ring_area(r), 12),
             _canonical_ring_key(r), r)
        )
    keyed.sort(key=lambda k: k[:4])
    return [(f"{region_id}_{i}", r) for i, (*_, r) in enumerate(keyed)]


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        T.StructField("region_id", T.StringType()),
        T.StructField("geometry", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
    ]
)


def extract_blocks(lines: DataFrame, regions: DataFrame) -> DataFrame:
    """Distributed block extraction.

    ``lines``: (osm_id, region_id, geometry array<array<double>>) — road /
    waterway linestrings already routed to regions (J2 cell join; a line
    crossing k regions appears k times). ``regions``: (region_id, geometry
    ring). Output: one row per block, BLOCKS_SCHEMA, ids canonical.

    One shuffle (groupBy region); each region's arrangement is a few
    hundred segments so the kernel is task-local. Regions are the unit of
    parallelism exactly like the reference's joblib fan-out
    (midway_blocks.py:80-82)."""

    def per_region(lines_pdf: pd.DataFrame, region_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(region_pdf) == 0 or len(lines_pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in BLOCKS_SCHEMA.fields])
        rid = region_pdf["region_id"].iloc[0]
        region_ring = geom.ring_to_np(region_pdf["geometry"].iloc[0])
        lns = [geom.ring_to_np(g) for g in lines_pdf["geometry"]]
        try:
            rings = polygonize_lines(lns, region_ring)
        except Exception:
            rings = []  # fault isolation: emit nothing, never fail the stage
        rows = []
        for bid, r in mint_block_ids(rings, rid):
            x0, y0, x1, y1 = geom.ring_bounds(r)
            rows.append(
                {
                    "block_id": bid,
                    "region_id": rid,
                    "geometry": [[float(x), float(y)] for x, y in r],
                    "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    n = lines.sparkSession.sparkContext.defaultParallelism * 2
    return (
        lines.select("region_id", "geometry")
        .repartition(n, "region_id")
        .groupBy("region_id")
        .cogroup(regions.repartition(n, "region_id").groupBy("region_id"))
        .applyInPandas(per_region, BLOCKS_SCHEMA)
    )
