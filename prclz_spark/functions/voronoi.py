"""Bowyer–Watson Delaunay triangulation → Voronoi cells, pure numpy.

Replaces ``pytess.voronoi`` (/root/reference/prclz/complexity.py:22) and R
``st_voronoi`` (prclz/parcelization/midway_parcelization.R:67-70). Runs
per block inside ``applyInPandas`` groups — blocks carry 10–10^3 points
(SURVEY.md §7.4), so the O(n²) incremental insert is fine; the distributed
dimension is the *number of blocks*, not points per block.

Returns the same contract pytess does: ``[(anchor_point_or_None,
cell_vertices), ...]``; cells of points on the super-triangle get
anchor=None and are filtered by the caller exactly like the reference
filters them (complexity.py:25: ``if anchor and ... len(vs) > 2``).
"""

from __future__ import annotations

import numpy as np


def _circumcircle(ax, ay, bx, by, cx, cy):
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-30:
        return None
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer–Watson over (n,2) points → triangles as index triples into the
    input. Deterministic: insertion in input order, deterministic
    perturbation of exact duplicates is the caller's job."""
    n = len(points)
    if n < 3:
        return []
    # super-triangle comfortably containing all points
    cx, cy = points[:, 0].mean(), points[:, 1].mean()
    span = max(points[:, 0].ptp(), points[:, 1].ptp(), 1e-9) * 64.0
    sp = np.array(
        [[cx - span, cy - span / 2], [cx + span, cy - span / 2], [cx, cy + span]]
    )
    pts = np.vstack([points, sp])
    S0, S1, S2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(S0, S1, S2)]
    circ: dict[tuple[int, int, int], tuple[float, float, float]] = {}

    def cc(t):
        if t not in circ:
            a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
            res = _circumcircle(a[0], a[1], b[0], b[1], c[0], c[1])
            circ[t] = res if res else (0.0, 0.0, -1.0)
        return circ[t]

    for i in range(n):
        px, py = pts[i]
        bad = []
        for t in tris:
            ux, uy, r2 = cc(t)
            if r2 >= 0 and (px - ux) ** 2 + (py - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # boundary of the cavity = edges appearing in exactly one bad triangle
        edge_count: dict[tuple[int, int], tuple[int, int]] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                if key in edge_count:
                    edge_count.pop(key)
                else:
                    edge_count[key] = e
        for t in bad:
            tris.remove(t)
        for e in edge_count.values():
            tris.append((e[0], e[1], i))
    # drop triangles touching the super-triangle
    return [t for t in tris if max(t) < n]


def voronoi(points_list: list[tuple[float, float]]):
    """pytess-contract Voronoi: list of (anchor | None, cell_vertex_list).

    Cell of point i = exact intersection of bisector half-planes against a
    large bounding frame (hull cells are unbounded in theory; pytess clips
    them to a frame too, and callers clip to the block anyway —
    complexity.py:28). Half-plane clipping is exact and convex by
    construction, robust where a dual-of-Delaunay ordering degenerates."""
    pts = np.asarray(points_list, dtype=float)
    # deterministic perturbation of exact duplicates (SURVEY.md §7.4)
    seen: dict[tuple[float, float], int] = {}
    for i in range(len(pts)):
        key = (pts[i, 0], pts[i, 1])
        if key in seen:
            seen[key] += 1
            pts[i] += 1e-9 * seen[key] * np.array([1.0, 1.0])
        else:
            seen[key] = 0

    n = len(pts)
    if n == 0:
        return []
    if n < 3:
        return [(tuple(points_list[i]), []) for i in range(n)]

    x0, y0 = pts[:, 0].min(), pts[:, 1].min()
    x1, y1 = pts[:, 0].max(), pts[:, 1].max()
    m = max(x1 - x0, y1 - y0, 1e-9) * 10.0
    frame = np.array(
        [[x0 - m, y0 - m], [x1 + m, y0 - m], [x1 + m, y1 + m], [x0 - m, y1 + m]]
    )
    out = []
    for i in range(n):
        cell = halfplane_voronoi_cell(i, pts, frame)
        out.append((tuple(points_list[i]), [tuple(c) for c in cell]))
    return out


def halfplane_voronoi_cell(i: int, pts: np.ndarray, frame: np.ndarray) -> np.ndarray:
    """Exact convex Voronoi cell of pts[i]: successively clip ``frame`` by
    the bisector half-plane toward other points, *nearest first*, stopping
    once the security radius is reached — if ||q-p||/2 >= max_v ||v-p||
    over current cell vertices v, then for every vertex ||v-q|| >=
    ||q-p|| - ||v-p|| >= ||v-p||, so q's bisector cannot cut the cell, and
    neither can any farther point. Exact result, typically O(k) clips for
    k natural neighbors instead of O(n)."""
    # list-of-tuples representation: cells are tiny (~6 vertices) so plain
    # Python beats numpy dispatch; the arithmetic expressions are identical
    # op-for-op, hence bit-identical results
    cell = [(float(x), float(y)) for x, y in frame]
    px, py = float(pts[i, 0]), float(pts[i, 1])
    d2 = (pts[:, 0] - px) ** 2 + (pts[:, 1] - py) ** 2
    order = np.argsort(d2, kind="stable").tolist()
    d2l = d2.tolist()
    max_r2 = max((cx - px) ** 2 + (cy - py) ** 2 for cx, cy in cell)
    for j in order:
        if j == i or not cell:
            continue
        if d2l[j] >= 4.0 * max_r2:
            break  # all remaining points are at least this far (sorted)
        qx, qy = float(pts[j, 0]), float(pts[j, 1])
        mx, my = (px + qx) / 2.0, (py + qy) / 2.0
        nx_, ny_ = qx - px, qy - py  # outward normal (toward q)
        side = [(x - mx) * nx_ + (y - my) * ny_ for x, y in cell]
        if all(s <= 1e-15 for s in side):  # keep side <= 0 (closer to p)
            continue
        n = len(cell)
        new_pts: list[tuple[float, float]] = []
        for a in range(n):
            b = a + 1 if a + 1 < n else 0
            sa, sb = side[a], side[b]
            if sa <= 1e-15:
                new_pts.append(cell[a])
                if not sb <= 1e-15:
                    t = sa / (sa - sb)
                    new_pts.append(
                        (cell[a][0] + t * (cell[b][0] - cell[a][0]),
                         cell[a][1] + t * (cell[b][1] - cell[a][1]))
                    )
            elif sb <= 1e-15:
                t = sa / (sa - sb)
                new_pts.append(
                    (cell[a][0] + t * (cell[b][0] - cell[a][0]),
                     cell[a][1] + t * (cell[b][1] - cell[a][1]))
                )
        cell = new_pts
        if cell:
            max_r2 = max((cx - px) ** 2 + (cy - py) ** 2 for cx, cy in cell)
    return np.asarray(cell) if cell else np.empty((0, 2))
