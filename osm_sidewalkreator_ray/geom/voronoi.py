"""Raster Voronoi tessellation (G9 validation aid; also the polygon
backing for G6b when full polygons are wanted instead of the
line-splitting shortcut).

Nearest-site labeling on a fixed grid + per-label boundary tracing —
deterministic, pure numpy, bounded by the raster size. Reference:
voronoi of road intersections ``osm_sidewalkreator.py:836-845``.
"""

from __future__ import annotations

import numpy as np

from . import raster


def voronoi_polygons(points: np.ndarray, bounds: tuple[float, float, float, float],
                     res: float = 2.0) -> list[tuple[int, np.ndarray, float]]:
    """Voronoi cells of ``points`` clipped to ``bounds``.

    Returns [(site_index, ring, area)] — one outer ring per site (the
    largest, if the raster produces slivers). Label assignment is
    exact per pixel center; ties break to the lowest site index
    (numpy argmin), so output is deterministic.
    """
    if len(points) == 0:
        return []
    mnx, mny, mxx, mxy = bounds
    nx = max(2, int((mxx - mnx) / res) + 1)
    ny = max(2, int((mxy - mny) / res) + 1)
    gx = mnx + (np.arange(nx) + 0.5) * res
    gy = mny + (np.arange(ny) + 0.5) * res
    label = np.empty((ny, nx), dtype=np.int32)
    # chunk rows to bound the (rows, nx, npts) distance tensor
    chunk = max(1, 4_000_000 // (nx * max(1, len(points))))
    for y0 in range(0, ny, chunk):
        y1 = min(ny, y0 + chunk)
        dx = gx[None, :, None] - points[None, None, :, 0]
        dy = gy[y0:y1, None, None] - points[None, None, :, 1]
        d2 = dx * dx + dy * dy
        label[y0:y1] = d2.argmin(axis=2)
    out = []
    for site in range(len(points)):
        mask = label == site
        if not mask.any():
            continue
        rings = raster.trace_contours(mask, (mnx, mny), res)
        pos = [(r, a) for r, a in rings if a > 0]
        if not pos:
            continue
        ring, area = max(pos, key=lambda ra: ra[1])
        out.append((site, raster.simplify_ring(ring, res), float(area)))
    return out
