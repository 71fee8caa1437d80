"""Exact polyline-to-polygon clipping (M1, reference ``cliplayer_v2``
``generic_functions.py:391-401``).

Each segment is split at its intersections with the clip polygon's
edges; pieces whose midpoint lies inside the polygon (even-odd, holes
respected) are kept — exact for arbitrary polygons, pure numpy. The
polygon is small (the AOI) and is broadcast by the caller.
"""

from __future__ import annotations

import numpy as np

from . import core


def clip_polyline(line: np.ndarray, coords: np.ndarray,
                  ring_offsets: np.ndarray, poly_lo: int, poly_hi: int
                  ) -> list[np.ndarray]:
    """One polyline -> kept sub-polylines inside the polygon."""
    edges0, edges1 = [], []
    for r in range(poly_lo, poly_hi):
        ring = coords[ring_offsets[r]:ring_offsets[r + 1]]
        edges0.append(ring[:-1])
        edges1.append(ring[1:])
    e0 = np.concatenate(edges0)
    e1 = np.concatenate(edges1)
    out: list[np.ndarray] = []
    cur: list[np.ndarray] = []

    def flush():
        if len(cur) >= 2:
            out.append(np.asarray(cur))
        cur.clear()

    for i in range(len(line) - 1):
        a, b = line[i], line[i + 1]
        na = len(e0)
        mask, _pts, ta, _tb = core.segments_intersections(
            np.broadcast_to(a, (na, 2)), np.broadcast_to(b, (na, 2)),
            e0, e1)
        ts = sorted({0.0, 1.0} | {float(t) for t in ta[mask]
                                  if 1e-12 < t < 1 - 1e-12})
        pts = [a + (b - a) * t for t in ts]
        for j in range(len(pts) - 1):
            mid = (pts[j] + pts[j + 1]) / 2.0
            inside = core.points_in_polygon(
                np.array([mid[0]]), np.array([mid[1]]),
                coords, ring_offsets, poly_lo, poly_hi)[0]
            if inside:
                if not cur:
                    cur.append(pts[j])
                elif not np.allclose(cur[-1], pts[j]):
                    flush()
                    cur.append(pts[j])
                cur.append(pts[j + 1])
            else:
                flush()
    flush()
    return out
