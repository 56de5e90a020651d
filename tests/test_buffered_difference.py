"""Block-extraction fidelity vs the reference's DEFAULT method.

The reference's production extractor is BufferedLineDifference —
``region.difference(roads.buffer(ε))`` (/root/reference/prclz/blocks/
methods.py:35-40) — while the engine ships the ε→0 arrangement
polygonization (the reference's own alternative, methods.py:43-106).
This suite pins their equivalence on a brute-force rasterized oracle of
the buffered difference, on BOTH the rectilinear grid family (where the
engine was already pinned) and the families where the two methods can
genuinely diverge:

- diagonal roads (faces are not axis-aligned),
- curved roads (polyline arcs),
- DEAD-END roads: the ε-semantics edge case. A dangling spur splits no
  arrangement face, and it does not split the buffered difference either
  — it only notches a 2ε-wide slit that stays CONNECTED to the rest of
  its block (the slit is open at the spur's free end). So block COUNT
  and block MEMBERSHIP agree exactly between the methods for every ε>0;
  only O(ε·spur length) of area differs. That bounded area gap, the
  count equality, and the sample-level membership bijection are what the
  oracle checks.

Oracle construction (pure numpy — no shapely in this environment):
sample the region on an h-grid, drop samples within ε of any road
segment (= the buffer), 4-connected-label the survivors (= the connected
components of the difference). Each component must map bijectively onto
one arrangement face, with every surviving sample inside its face and
the area gap within (perimeter + 2·road length)·(ε + 2h).
"""

import numpy as np
import pytest

from prclz_spark.functions import geom
from prclz_spark.operators import blocks

EPS = 0.01
H = 0.0025

SQUARE = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)


def _seg_dist(px, py, segs):
    """Min distance from each (px, py) to any segment; vectorized over
    points per segment."""
    best = np.full(len(px), np.inf)
    for (ax, ay), (bx, by) in segs:
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        if L2 == 0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            t = np.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0.0, 1.0)
            d2 = (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2
        best = np.minimum(best, np.sqrt(d2))
    return best


def _label4(mask):
    """4-connected component labels of a boolean grid via numpy frontier
    dilation (no scipy in this environment)."""
    labels = np.full(mask.shape, -1, dtype=int)
    nxt = 0
    while True:
        seeds = np.argwhere(mask & (labels < 0))
        if len(seeds) == 0:
            return labels, nxt
        frontier = np.zeros_like(mask)
        frontier[tuple(seeds[0])] = True
        comp = np.zeros_like(mask)
        while frontier.any():
            comp |= frontier
            grow = np.zeros_like(mask)
            grow[1:, :] |= frontier[:-1, :]
            grow[:-1, :] |= frontier[1:, :]
            grow[:, 1:] |= frontier[:, :-1]
            grow[:, :-1] |= frontier[:, 1:]
            frontier = grow & mask & ~comp
        labels[comp] = nxt
        nxt += 1


def _buffered_difference_oracle(roads, eps=EPS, h=H):
    """Rasterized region.difference(roads.buffer(eps)) over the unit
    square: list of components, each (n_samples, xs, ys)."""
    axis = np.arange(h / 2, 1.0, h)
    gx, gy = np.meshgrid(axis, axis)
    px, py = gx.ravel(), gy.ravel()
    segs = []
    for line in roads:
        arr = np.asarray(line, float)
        segs.extend(zip(arr[:-1], arr[1:]))
    far = _seg_dist(px, py, segs) > eps
    mask = far.reshape(gx.shape)
    labels, n = _label4(mask)
    flat = labels.ravel()
    out = []
    for c in range(n):
        sel = flat == c
        out.append((int(sel.sum()), px[sel], py[sel]))
    return out


def _road_length(roads):
    total = 0.0
    for line in roads:
        arr = np.asarray(line, float)
        total += float(
            np.sqrt(((arr[1:] - arr[:-1]) ** 2).sum(axis=1)).sum()
        )
    return total


def _check_equivalence(roads, expect_blocks=None):
    """The pinned claim: arrangement faces == buffered-difference
    components, bijectively, with every surviving sample inside its
    face and the area gap ε-bounded."""
    faces = blocks.polygonize_lines(list(roads) + [SQUARE], SQUARE)
    comps = _buffered_difference_oracle(roads)
    assert len(faces) == len(comps), (
        f"face count {len(faces)} != buffered-difference components "
        f"{len(comps)}"
    )
    if expect_blocks is not None:
        assert len(faces) == expect_blocks
    road_len = _road_length(roads)
    matched = set()
    for n_samp, xs, ys in comps:
        hits = [
            i
            for i, f in enumerate(faces)
            if geom.point_in_polygon(float(xs[0]), float(ys[0]), f)
        ]
        assert len(hits) == 1, f"component seed in {len(hits)} faces"
        fi = hits[0]
        assert fi not in matched, "two components mapped to one face"
        matched.add(fi)
        face = faces[fi]
        # every sample of the component lies in the matched face
        # (subsample for speed; the seed check above anchors identity)
        step = max(1, len(xs) // 200)
        for x, y in zip(xs[::step], ys[::step]):
            assert geom.point_in_polygon(float(x), float(y), face)
        # ε-bounded area gap: buffer erosion strips at most
        # (face-adjacent road length ≤ total road length, twice for a
        # spur's two sides) * ε, plus raster error ~ perimeter * h
        area_face = geom.ring_area(face)
        area_comp = n_samp * H * H
        perim = float(
            np.sqrt(((face[1:] - face[:-1]) ** 2).sum(axis=1)).sum()
        )
        bound = (perim + 2.0 * road_len) * (EPS + 2 * H)
        assert abs(area_face - area_comp) <= bound, (
            f"area gap {abs(area_face - area_comp):.5f} > bound {bound:.5f}"
        )
    assert len(matched) == len(faces)


def test_grid_family_matches_buffered_difference():
    roads = [
        np.array([[0.5, 0.0], [0.5, 1.0]]),
        np.array([[0.0, 0.5], [1.0, 0.5]]),
    ]
    _check_equivalence(roads, expect_blocks=4)


def test_diagonal_family_matches_buffered_difference():
    roads = [
        np.array([[0.0, 0.0], [1.0, 1.0]]),  # corner-to-corner diagonal
        np.array([[0.5, 0.0], [0.5, 1.0]]),
    ]
    _check_equivalence(roads, expect_blocks=4)


def test_dead_end_family_matches_buffered_difference():
    """A dangling spur splits no face AND no buffered-difference
    component — both methods still see 2 blocks; only an O(ε·spur) area
    notch differs (inside the bound)."""
    roads = [
        np.array([[0.5, 0.0], [0.5, 1.0]]),
        np.array([[0.5, 0.5], [0.8, 0.5]]),  # dead-end stub into right block
    ]
    _check_equivalence(roads, expect_blocks=2)


def test_diagonal_plus_dead_end_family():
    roads = [
        np.array([[0.0, 0.0], [1.0, 1.0]]),
        np.array([[0.0, 0.25], [1.0, 0.25]]),  # crosses the diagonal
        np.array([[0.6, 0.6], [0.85, 0.6]]),  # spur hanging off the diagonal
    ]
    _check_equivalence(roads, expect_blocks=4)


def test_curved_family_matches_buffered_difference():
    """Polyline arc (quarter circle, 8 chords) boundary-to-boundary."""
    t = np.linspace(0.0, np.pi / 2, 9)
    arc = np.stack([0.55 * np.cos(t), 0.55 * np.sin(t)], axis=1)
    roads = [arc]
    _check_equivalence(roads, expect_blocks=2)


def test_duplicated_dead_end_spur_still_pruned():
    """Overlapping/duplicate road polylines: a spur that appears twice in
    the input must still prune (degree counted over DEDUPLICATED
    undirected edges — the raw count would give its free endpoint degree
    2 and leave a whisker in the block ring)."""
    spur = np.array([[0.5, 0.5], [0.8, 0.5]])
    roads = [
        np.array([[0.5, 0.0], [0.5, 1.0]]),
        spur,
        spur.copy(),  # duplicate polyline
    ]
    faces = blocks.polygonize_lines(list(roads) + [SQUARE], SQUARE)
    assert len(faces) == 2
    for f in faces:
        # no whisker: every ring vertex appears exactly once
        vs = [tuple(np.round(v, 9)) for v in f]
        assert len(vs) == len(set(vs))
        assert (0.8, 0.5) not in set(vs)


def test_dead_end_free_spur_in_open_face():
    """Spur not touching any other road: the arrangement face trace must
    not invent a block around it, and the buffered difference stays one
    component."""
    roads = [
        np.array([[0.3, 0.3], [0.7, 0.7]]),  # isolated floating segment
    ]
    _check_equivalence(roads, expect_blocks=1)
