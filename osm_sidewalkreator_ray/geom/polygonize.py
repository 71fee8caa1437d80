"""Planar street-graph operators: noding, degrees, pruning, faces.

Reimplements the reference's graph chain exactly-but-vectorized:
- G2 split lines at intersections (``generic_functions.py:462-470``,
  self-application ``osm_sidewalkreator.py:794-800``)
- G4 street intersection points (``generic_functions.py:381-388``)
- A6 endpoint-degree computation (``osm_sidewalkreator.py:1258-1337``)
- G3 dead-end pruning (``generic_functions.py:859-918``, loop
  ``osm_sidewalkreator.py:803-810``)
- G1 polygonize noded lines into faces/protoblocks
  (``generic_functions.py:195-217``)

All operators are cell-local (they run inside ``map_groups`` on one
spatial cell's streets in the cell's local metric frame), so plain
numpy + small dicts are fine: a cell holds 10^2-10^3 segments.
"""

from __future__ import annotations

import numpy as np

from .core import segments_intersections


def explode_segments(coords: np.ndarray, offsets: np.ndarray):
    """Polylines -> individual segments (s0, s1, line_idx)."""
    n = len(offsets) - 1
    if n == 0 or len(coords) < 2:
        e = np.empty((0, 2))
        return e, e.copy(), np.empty(0, dtype=np.int64)
    keep = np.ones(len(coords) - 1, dtype=bool)
    keep[np.asarray(offsets[1:-1]) - 1] = False
    s0 = coords[:-1][keep]
    s1 = coords[1:][keep]
    line_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets) - 1)
    return s0, s1, line_idx


def node_segments(s0: np.ndarray, s1: np.ndarray, line_idx: np.ndarray,
                  snap_tol: float = 1e-6, max_pairs: int = 20_000_000):
    """Split all segments at their pairwise intersection points (G2).

    Returns (n0, n1, parent): noded segments and their source line index.
    Endpoints are snapped to a ``snap_tol`` grid so coincident nodes
    unify exactly (the reference relies on GEOS noding + 0.1 m dedup).
    """
    m = len(s0)
    if m == 0:
        return s0, s1, line_idx
    # candidate pairs by bbox overlap — chunked O(m^2) mask (cell-local m)
    mnx = np.minimum(s0[:, 0], s1[:, 0]); mxx = np.maximum(s0[:, 0], s1[:, 0])
    mny = np.minimum(s0[:, 1], s1[:, 1]); mxy = np.maximum(s0[:, 1], s1[:, 1])
    tvals: list[list[float]] = [[] for _ in range(m)]
    chunk = max(1, min(m, max_pairs // max(m, 1)))
    for lo in range(0, m, chunk):
        hi = min(m, lo + chunk)
        ov = ((mnx[lo:hi, None] <= mxx[None, :]) & (mxx[lo:hi, None] >= mnx[None, :])
              & (mny[lo:hi, None] <= mxy[None, :]) & (mxy[lo:hi, None] >= mny[None, :]))
        ii, jj = np.nonzero(ov)
        ii = ii + lo
        keep = ii < jj  # each unordered pair once
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            continue
        mask, pts, ta, tb = segments_intersections(s0[ii], s1[ii], s0[jj], s1[jj])
        for a, b, t_a, t_b in zip(ii[mask], jj[mask], ta[mask], tb[mask]):
            if 1e-9 < t_a < 1 - 1e-9:
                tvals[a].append(float(t_a))
            if 1e-9 < t_b < 1 - 1e-9:
                tvals[b].append(float(t_b))
    out0, out1, parent = [], [], []
    for i in range(m):
        ts = sorted(set([0.0, 1.0] + tvals[i]))
        p = s0[i] + np.outer(ts, s1[i] - s0[i])
        out0.append(p[:-1])
        out1.append(p[1:])
        parent.append(np.full(len(ts) - 1, line_idx[i], dtype=np.int64))
    n0 = np.concatenate(out0); n1 = np.concatenate(out1)
    parent = np.concatenate(parent)
    if snap_tol > 0:
        n0 = np.round(n0 / snap_tol) * snap_tol
        n1 = np.round(n1 / snap_tol) * snap_tol
    # drop zero-length pieces
    keep = np.any(n0 != n1, axis=1)
    return n0[keep], n1[keep], parent[keep]


def intersection_points(s0, s1) -> np.ndarray:
    """Deduplicated pairwise intersection points (G4 + A5)."""
    m = len(s0)
    if m < 2:
        return np.empty((0, 2))
    ii, jj = np.triu_indices(m, k=1)
    mask, pts, ta, tb = segments_intersections(s0[ii], s1[ii], s0[jj], s1[jj])
    pts = pts[mask]
    if len(pts) == 0:
        return pts
    key = np.round(pts / 1e-6).astype(np.int64)
    _, uniq = np.unique(key, axis=0, return_index=True)
    return pts[np.sort(uniq)]


def _node_ids(n0: np.ndarray, n1: np.ndarray, tol: float = 1e-6):
    """Quantize endpoints to shared integer node ids."""
    allp = np.vstack((n0, n1))
    q = np.round(allp / tol).astype(np.int64)
    uniq, inv = np.unique(q, axis=0, return_inverse=True)
    m = len(n0)
    return uniq.astype(np.float64) * tol, inv[:m], inv[m:]


def node_degrees(n0: np.ndarray, n1: np.ndarray, tol: float = 1e-6):
    """(nodes, deg, a_id, b_id): endpoint degree of the segment graph (A6)."""
    nodes, a, b = _node_ids(n0, n1, tol)
    deg = np.bincount(np.concatenate((a, b)), minlength=len(nodes))
    return nodes, deg, a, b


def prune_dead_ends(n0, n1, parent, iterations: int, tol: float = 1e-6):
    """Iteratively drop segments with a degree-1 endpoint (G3).

    Mirrors the reference's bounded loop (0..7 iterations,
    osm_sidewalkreator.py:803-810).
    """
    for _ in range(max(0, iterations)):
        if len(n0) == 0:
            break
        _, deg, a, b = node_degrees(n0, n1, tol)
        keep = (deg[a] > 1) & (deg[b] > 1)
        if keep.all():
            break
        n0, n1, parent = n0[keep], n1[keep], parent[keep]
    return n0, n1, parent


def prune_dead_ends_protected(n0, n1, parent, faces, buffer: float = 0.5,
                              tol: float = 1e-6):
    """G3 culs-de-sac variant (remove_lines_from_no_block,
    generic_functions.py:859-918, caller osm_sidewalkreator.py:803-806):
    ONE pass that drops segments with a free endpoint UNLESS the
    segment lies within a (0.5 m-buffered) protoblock face — dead-end
    streets inside a block (culs-de-sac) are protected."""
    from . import core as _core
    if len(n0) == 0:
        return n0, n1, parent
    _, deg, a, b = node_degrees(n0, n1, tol)
    dead = (deg[a] == 1) | (deg[b] == 1)
    if not dead.any():
        return n0, n1, parent
    keep = ~dead
    if faces:
        mid = (n0 + n1) / 2.0
        for i in np.nonzero(dead)[0]:
            pts = np.vstack((n0[i], mid[i], n1[i]))
            for face in faces:
                inside = _core.points_in_ring(pts[:, 0], pts[:, 1], face)
                if inside.all():
                    keep[i] = True
                    break
                # buffered-within: points outside but within `buffer`
                # of the ring still count (protoblocks_buffer)
                d = np.array([
                    _core.point_segment_dist(
                        pts[:, 0], pts[:, 1],
                        face[j, 0], face[j, 1],
                        face[j + 1, 0], face[j + 1, 1])
                    for j in range(len(face) - 1)]).min(axis=0)
                if (inside | (d <= buffer)).all():
                    keep[i] = True
                    break
    return n0[keep], n1[keep], parent[keep]


def polygonize_faces(n0: np.ndarray, n1: np.ndarray, tol: float = 1e-6):
    """Faces of a noded segment graph (G1 protoblocks).

    Classic half-edge face tracing: at every node, outgoing edges are
    sorted by angle; the successor of half-edge (u->v) is the clockwise
    next edge after (v->u) at v. Bounded faces come out CCW (positive
    shoelace area). Returns a list of closed rings (float64[N,2]).
    """
    if len(n0) == 0:
        return []
    nodes, a, b = _node_ids(n0, n1, tol)
    # drop duplicate undirected edges and self-loops
    lo = np.minimum(a, b); hi = np.maximum(a, b)
    key = lo.astype(np.int64) << 32 | hi.astype(np.int64)
    _, uniq = np.unique(key, return_index=True)
    a, b = a[uniq], b[uniq]
    ok = a != b
    a, b = a[ok], b[ok]
    if len(a) == 0:
        return []
    # half-edges
    he_u = np.concatenate((a, b))
    he_v = np.concatenate((b, a))
    nhe = len(he_u)
    twin = np.concatenate((np.arange(nhe // 2) + nhe // 2, np.arange(nhe // 2)))
    ang = np.arctan2(nodes[he_v][:, 1] - nodes[he_u][:, 1],
                     nodes[he_v][:, 0] - nodes[he_u][:, 0])
    # per-node angular order of outgoing half-edges
    order = np.lexsort((ang, he_u))
    # position of each half-edge within its node's sorted fan
    node_start: dict[int, int] = {}
    sorted_u = he_u[order]
    starts = np.nonzero(np.diff(sorted_u, prepend=-1))[0]
    for s in starts:
        node_start[int(sorted_u[s])] = int(s)
    counts = np.bincount(he_u, minlength=len(nodes))
    pos_in_fan = np.empty(nhe, dtype=np.int64)
    pos_in_fan[order] = np.arange(nhe) - np.asarray(
        [node_start[int(u)] for u in sorted_u])
    # next(he) = at node v, the edge clockwise-after twin(he)
    nxt = np.empty(nhe, dtype=np.int64)
    for h in range(nhe):
        t = twin[h]
        v = he_u[t]
        fan = counts[v]
        p = (pos_in_fan[t] - 1) % fan  # clockwise next in CCW-sorted fan
        nxt[h] = order[node_start[int(v)] + p]
    faces = []
    used = np.zeros(nhe, dtype=bool)
    for h0 in range(nhe):
        if used[h0]:
            continue
        ring_nodes = []
        h = h0
        while not used[h]:
            used[h] = True
            ring_nodes.append(he_u[h])
            h = nxt[h]
        if h != h0 or len(ring_nodes) < 3:
            continue
        ring = nodes[np.asarray(ring_nodes + [ring_nodes[0]])]
        x, y = ring[:, 0], ring[:, 1]
        area = 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        if area > tol:
            faces.append(ring)
    return faces
