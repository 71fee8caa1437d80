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


def _polygon_edges(coords: np.ndarray, ring_offsets: np.ndarray,
                   poly_lo: int, poly_hi: int):
    e0s, e1s = [], []
    for r in range(poly_lo, poly_hi):
        ring = coords[ring_offsets[r]:ring_offsets[r + 1]]
        e0s.append(ring[:-1])
        e1s.append(ring[1:])
    return np.concatenate(e0s), np.concatenate(e1s)


def classify_parts(lcoords: np.ndarray, offsets: np.ndarray,
                   coords: np.ndarray, ring_offsets: np.ndarray,
                   poly_lo: int, poly_hi: int, pair_budget: int = 1 << 20):
    """Vectorized in/out/boundary triage of many polylines vs one polygon.

    Returns bool arrays ``(all_in, any_in, crosses)``, one entry per
    part. ``all_in & ~crosses`` ⇒ the part lies entirely inside (keep
    whole, no clipping); ``~any_in & ~crosses`` ⇒ entirely outside
    (drop) — exact, because entering a simple polygon requires crossing
    an edge, and any edge hit (including endpoint touches, which the
    exact clip resolves by midpoint tests) sets ``crosses``. Everything
    else must go through :func:`clip_polyline`. One point-in-polygon
    pass + one chunked segment×edge sweep; no per-row Python work.
    """
    n_parts = len(offsets) - 1
    if n_parts == 0:
        z = np.zeros(0, dtype=bool)
        return z, z, z
    vin = core.points_in_polygon(lcoords[:, 0], lcoords[:, 1],
                                 coords, ring_offsets, poly_lo, poly_hi)
    starts = offsets[:-1]
    all_in = np.logical_and.reduceat(vin, starts)
    any_in = np.logical_or.reduceat(vin, starts)
    counts = np.diff(offsets)
    segmask = np.ones(max(len(lcoords) - 1, 0), dtype=bool)
    segmask[offsets[1:-1] - 1] = False  # joints between parts
    idx = np.nonzero(segmask)[0]
    e0, e1 = _polygon_edges(coords, ring_offsets, poly_lo, poly_hi)
    d2 = e1 - e0
    seg_cross = np.zeros(len(idx), dtype=bool)
    eps = 1e-9
    step = max(1, pair_budget // max(1, len(e0)))
    for c0 in range(0, len(idx), step):
        sl = idx[c0:c0 + step]
        a0 = lcoords[sl][:, None, :]
        d1 = (lcoords[sl + 1] - lcoords[sl])[:, None, :]
        denom = d1[..., 0] * d2[None, :, 1] - d1[..., 1] * d2[None, :, 0]
        ok = np.abs(denom) > 1e-12
        denom = np.where(ok, denom, 1.0)
        diff = e0[None, :, :] - a0
        ta = (diff[..., 0] * d2[None, :, 1]
              - diff[..., 1] * d2[None, :, 0]) / denom
        tb = (diff[..., 0] * d1[..., 1]
              - diff[..., 1] * d1[..., 0]) / denom
        hit = (ok & (ta >= -eps) & (ta <= 1 + eps)
               & (tb >= -eps) & (tb <= 1 + eps))
        seg_cross[c0:c0 + step] = hit.any(axis=1)
    crosses = np.zeros(n_parts, dtype=bool)
    if len(seg_cross):
        # degenerate single-point parts contribute 0 segments: their
        # reduceat offset would duplicate the NEXT part's (inheriting
        # its crossing flag) and a trailing one would index out of
        # bounds — reduce only at parts that own >=1 segment
        seg_counts = counts - 1
        valid = seg_counts > 0
        offs_all = np.concatenate(([0], np.cumsum(seg_counts)))[:-1]
        crosses[valid] = np.logical_or.reduceat(seg_cross, offs_all[valid])
    return all_in, any_in, crosses


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


def clip_lines_rect(lcoords: np.ndarray, offsets: np.ndarray,
                    line_idx: np.ndarray, boxes: np.ndarray):
    """Vectorized Liang-Barsky clip of many (polyline, rectangle) pairs.

    The tile-slicing kernel: each pair ``p`` clips line ``line_idx[p]``
    (rows ``offsets[l]:offsets[l+1]`` of ``lcoords``) against the
    axis-aligned box ``boxes[p] = (x0, y0, x1, y1)``. One pair-axis
    pass over ALL segments of ALL pairs — no Python per pair.

    Returns ``(pcoords, poffsets, piece_pair)``: ragged piece
    coordinates plus, per piece, the input pair it came from. Pieces
    are maximal runs of consecutive clipped segments that stay joined
    (an interior cut starts a new piece). Zero-length touches are
    dropped.
    """
    line_idx = np.asarray(line_idx, dtype=np.int64)
    boxes = np.asarray(boxes, dtype=np.float64)
    nseg_all = np.diff(offsets) - 1
    nseg = nseg_all[line_idx]
    P = len(line_idx)
    empty = (np.zeros((0, 2)), np.zeros(1, dtype=np.int64),
             np.zeros(0, dtype=np.int64))
    if P == 0 or nseg.sum() == 0:
        return empty
    pair_of = np.repeat(np.arange(P, dtype=np.int64), nseg)
    starts = np.concatenate(([0], np.cumsum(nseg)[:-1]))
    rank = np.arange(nseg.sum(), dtype=np.int64) - np.repeat(starts, nseg)
    row = offsets[line_idx][pair_of] + rank
    a = lcoords[row]
    b = lcoords[row + 1]
    dx = b[:, 0] - a[:, 0]
    dy = b[:, 1] - a[:, 1]
    bx = boxes[pair_of]
    t0 = np.zeros(len(row))
    t1 = np.ones(len(row))
    keep = np.ones(len(row), dtype=bool)
    for p, q in ((-dx, a[:, 0] - bx[:, 0]), (dx, bx[:, 2] - a[:, 0]),
                 (-dy, a[:, 1] - bx[:, 1]), (dy, bx[:, 3] - a[:, 1])):
        para = p == 0.0
        keep &= ~(para & (q < 0.0))
        r = np.divide(q, p, out=np.zeros_like(q), where=~para)
        t0 = np.where(~para & (p < 0), np.maximum(t0, r), t0)
        t1 = np.where(~para & (p > 0), np.minimum(t1, r), t1)
    keep &= t0 < t1  # strict: zero-length touches dropped
    if not keep.any():
        return empty
    pair_k = pair_of[keep]
    rank_k = rank[keep]
    t0k, t1k = t0[keep], t1[keep]
    ax, ay = a[keep, 0], a[keep, 1]
    dxk, dyk = dx[keep], dy[keep]
    p0 = np.column_stack((ax + t0k * dxk, ay + t0k * dyk))
    p1 = np.column_stack((ax + t1k * dxk, ay + t1k * dyk))
    # piece breaks: pair change, segment-index gap, or an interior cut
    new_piece = np.ones(len(pair_k), dtype=bool)
    if len(pair_k) > 1:
        new_piece[1:] = ((pair_k[1:] != pair_k[:-1])
                         | (rank_k[1:] != rank_k[:-1] + 1)
                         | (t1k[:-1] < 1.0) | (t0k[1:] > 0.0))
    piece_id = np.cumsum(new_piece) - 1
    n_pieces = piece_id[-1] + 1
    # each kept segment contributes its end point; piece heads also
    # contribute their start point
    n_out = len(pair_k) + n_pieces
    pcoords = np.empty((n_out, 2))
    dst = np.arange(len(pair_k), dtype=np.int64) + piece_id + 1
    pcoords[dst] = p1
    pcoords[dst[new_piece] - 1] = p0[new_piece]
    poffsets = np.concatenate(([0], np.cumsum(
        np.bincount(piece_id, minlength=n_pieces) + 1)))
    return pcoords, poffsets.astype(np.int64), pair_k[new_piece]


def _sh_pass(pts: np.ndarray, offs: np.ndarray, pair: np.ndarray,
             boxes: np.ndarray, axis: int, side: int):
    """One Sutherland-Hodgman half-plane pass over ALL open rings.

    ``side`` 0 keeps coord >= lo bound, 1 keeps coord <= hi bound
    (boxes laid out (x0, y0, x1, y1)). Rings that collapse below 3
    vertices are dropped.
    """
    counts = np.diff(offs)
    vp = np.repeat(pair, counts)
    bound = boxes[vp, axis + 2 * side]
    coord = pts[:, axis]
    inside = coord >= bound if side == 0 else coord <= bound
    nxt = np.arange(len(pts)) + 1
    nxt[offs[1:] - 1] = offs[:-1]  # wrap each ring
    ins_n = inside[nxt]
    cross = inside != ins_n
    out_cnt = cross.astype(np.int64) + ins_n
    pos = np.concatenate(([0], np.cumsum(out_cnt)))
    out = np.empty((pos[-1], 2))
    ci = np.nonzero(cross)[0]
    if len(ci):
        a, b = pts[ci], pts[nxt[ci]]
        t = (bound[ci] - a[:, axis]) / (b[:, axis] - a[:, axis])
        ip = a + (b - a) * t[:, None]
        ip[:, axis] = bound[ci]  # land exactly on the boundary
        out[pos[ci]] = ip
    ni = np.nonzero(ins_n)[0]
    out[pos[ni] + cross[ni]] = pts[nxt[ni]]
    ring_cnt = np.add.reduceat(out_cnt, np.asarray(offs[:-1],
                                                   dtype=np.intp))
    keep = ring_cnt >= 3
    if keep.all():
        return out, pos[np.concatenate(([0], np.cumsum(counts)))], pair
    out = out[np.repeat(keep, ring_cnt)]
    offs2 = np.concatenate(([0], np.cumsum(ring_cnt[keep])))
    return out, offs2.astype(np.int64), pair[keep]


def clip_rings_rect(coords: np.ndarray, ring_offsets: np.ndarray,
                    ring_idx: np.ndarray, boxes: np.ndarray):
    """Batched Sutherland-Hodgman: ring ``ring_idx[p]`` vs the
    axis-aligned box ``boxes[p]``, all pairs in four vectorized
    half-plane passes (no Python per pair).

    Input rings must be closed (first == last). Returns
    ``(out_coords, out_offsets, out_pair)`` of CLOSED clipped rings —
    at most one per pair (a concave ring whose window intersection is
    disconnected comes back as one ring with zero-width bridges, the
    standard SH/MVT behavior: area and even-odd containment off the
    bridge line are unaffected).
    """
    ring_idx = np.asarray(ring_idx, dtype=np.int64)
    boxes = np.asarray(boxes, dtype=np.float64)
    P = len(ring_idx)
    empty = (np.zeros((0, 2)), np.zeros(1, dtype=np.int64),
             np.zeros(0, dtype=np.int64))
    if P == 0:
        return empty
    n_open = (np.diff(ring_offsets))[ring_idx] - 1
    if np.any(n_open < 3):
        raise ValueError("rings must be closed with >= 4 stored points")
    pair_of = np.repeat(np.arange(P, dtype=np.int64), n_open)
    starts = np.concatenate(([0], np.cumsum(n_open)[:-1]))
    rank = (np.arange(n_open.sum(), dtype=np.int64)
            - np.repeat(starts, n_open))
    pts = coords[np.asarray(ring_offsets)[ring_idx][pair_of] + rank]
    offs = np.concatenate(([0], np.cumsum(n_open))).astype(np.int64)
    pair = np.arange(P, dtype=np.int64)
    for axis, side in ((0, 0), (0, 1), (1, 0), (1, 1)):
        if len(pair) == 0:
            return empty
        pts, offs, keep_local = _sh_pass(pts, offs, pair, boxes, axis,
                                         side)
        pair = keep_local
    if len(pair) == 0:
        return empty
    # close rings: append each ring's first point
    counts = np.diff(offs)
    out = np.empty((len(pts) + len(pair), 2))
    dst = np.arange(len(pts), dtype=np.int64) + np.repeat(
        np.arange(len(pair), dtype=np.int64), counts)
    out[dst] = pts
    closed_offs = np.concatenate(([0], np.cumsum(counts + 1)))
    out[closed_offs[1:] - 1] = pts[np.asarray(offs[:-1], dtype=np.intp)]
    return out, closed_offs.astype(np.int64), pair
