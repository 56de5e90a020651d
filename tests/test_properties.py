"""Property-based kernel tests (hypothesis): geometry invariants that must
hold for ANY input, complementing the fixture-pinned tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prclz_spark.functions import cells, geom

coord = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False, width=64)


def _convex_polygon(center_x, center_y, knobs):
    """Convex polygon: vertices on a circle (always convex), angles
    jittered by the knob values, radius set by the first knob."""
    knobs = np.asarray(knobs, dtype=float)
    n = len(knobs)
    base = np.linspace(0, 2 * np.pi, n, endpoint=False)
    jitter = (knobs - knobs.min()) / max(knobs.ptp(), 1e-9)  # in [0, 1]
    angles = base + jitter * (np.pi / n) * 0.9  # keeps ordering strict
    r = float(knobs[0])
    return np.column_stack(
        [center_x + r * np.cos(angles), center_y + r * np.sin(angles)]
    )


@given(
    cx=coord, cy=coord,
    radii=st.lists(st.floats(1.0, 5.0, allow_nan=False), min_size=4, max_size=10),
    px=st.floats(-8.0, 8.0, allow_nan=False), py=st.floats(-8.0, 8.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_pip_matches_halfplane_test_on_convex(cx, cy, radii, px, py):
    """Ray-cast PIP agrees with the exact all-edges-same-side test on
    convex polygons (away from boundaries)."""
    ring = _convex_polygon(cx, cy, np.asarray(radii))
    x, y = cx + px, cy + py
    a = ring
    b = np.roll(ring, -1, axis=0)
    side = (b[:, 0] - a[:, 0]) * (y - a[:, 1]) - (b[:, 1] - a[:, 1]) * (x - a[:, 0])
    if np.abs(side).min() < 1e-6:  # too close to an edge: both answers legal
        return
    expected = bool((side > 0).all() or (side < 0).all())
    got = geom.point_in_polygon(x, y, ring)
    assert got == expected


@given(
    cx=coord, cy=coord,
    radii=st.lists(st.floats(1.0, 5.0, allow_nan=False), min_size=4, max_size=8),
)
@settings(max_examples=100, deadline=None)
def test_clip_self_is_identity_area(cx, cy, radii):
    ring = _convex_polygon(cx, cy, np.asarray(radii))
    clipped = geom.clip_polygon_convex(ring, ring)
    assert abs(geom.ring_area(clipped) - geom.ring_area(ring)) < 1e-9 * max(
        1.0, geom.ring_area(ring)
    )


@given(
    cx=coord, cy=coord,
    radii=st.lists(st.floats(1.0, 5.0, allow_nan=False), min_size=4, max_size=8),
    rx0=st.floats(-4.0, 0.0), ry0=st.floats(-4.0, 0.0),
    w=st.floats(0.5, 6.0), h=st.floats(0.5, 6.0),
)
@settings(max_examples=100, deadline=None)
def test_clip_area_bounded(cx, cy, radii, rx0, ry0, w, h):
    ring = _convex_polygon(cx, cy, np.asarray(radii))
    x0, y0 = cx + rx0, cy + ry0
    a = geom.rect_polygon_overlap_area(x0, y0, x0 + w, y0 + h, ring)
    assert -1e-12 <= a <= min(w * h, geom.ring_area(ring)) + 1e-9


@given(
    lon=st.floats(-170.0, 170.0, allow_nan=False),
    lat=st.floats(-80.0, 80.0, allow_nan=False),
    res=st.integers(5, 20),
)
@settings(max_examples=200, deadline=None)
def test_cell_id_contains_its_point(lon, lat, res):
    """A point's cell bounds always contain the point."""
    cid = int(cells.cell_id_np(np.array([lon]), np.array([lat]), res)[0])
    x0, y0, x1, y1 = cells.cell_bounds(cid)
    assert x0 - 1e-9 <= lon <= x1 + 1e-9
    assert y0 - 1e-9 <= lat <= y1 + 1e-9


@given(
    cx=st.floats(-10.0, 10.0), cy=st.floats(40.0, 60.0),
    radii=st.lists(st.floats(0.01, 0.05), min_size=4, max_size=8),
    res=st.integers(10, 14),
)
@settings(max_examples=50, deadline=None)
def test_cover_classified_sound(cx, cy, radii, res):
    """interior cells: center strictly inside the polygon; cover includes
    the cell of every polygon vertex."""
    ring = _convex_polygon(cx, cy, np.asarray(radii))
    ids, interior = cells.cover_cells_classified(ring, res)
    idset = set(int(i) for i in ids)
    for vx, vy in ring:
        assert int(cells.cell_id_np(np.array([vx]), np.array([vy]), res)[0]) in idset
    for cid, is_int in zip(ids, interior):
        if is_int:
            x0, y0, x1, y1 = cells.cell_bounds(int(cid))
            assert geom.point_in_polygon((x0 + x1) / 2, (y0 + y1) / 2, ring)


@given(
    ax=coord, ay=coord, bx=coord, by=coord, px=coord, py=coord,
)
@settings(max_examples=300, deadline=None)
def test_seg_distance_bounds(ax, ay, bx, by, px, py):
    """Segment distance never exceeds either endpoint distance and is
    never negative."""
    d, cx_, cy_ = geom.seg_point_distance(
        np.array([ax]), np.array([ay]), np.array([bx]), np.array([by]),
        np.array([px]), np.array([py]),
    )
    d0 = np.hypot(px - ax, py - ay)
    d1 = np.hypot(px - bx, py - by)
    assert 0 <= d[0] <= min(d0, d1) + 1e-9
    # the reported closest point actually realizes the distance
    assert abs(np.hypot(px - cx_[0], py - cy_[0]) - d[0]) < 1e-9
