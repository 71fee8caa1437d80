"""Uniform-grid spatial index — QgsSpatialIndex/STRtree stand-in.

The reference builds an R-tree per layer for candidate pruning
(``generic_functions.py:999-1020``; kNN at ``osm_sidewalkreator.py:
1703-1764``). With no GEOS/rtree available, this module implements a
uniform hash grid over segment bboxes: exact within a distance cap
(a segment within ``max_dist`` of a point always lands in the point's
3x3 cell ring when the grid pitch equals ``max_dist``), fully
vectorized per point-group, and bounded-memory — the property that
matters for the hot-cell page-join at scale.
"""

from __future__ import annotations

import numpy as np

from .core import point_segment_dist


class SegmentGrid:
    """Index over M segments (s0[M,2] -> s1[M,2]) with pitch ``cell``."""

    def __init__(self, s0: np.ndarray, s1: np.ndarray, cell: float):
        self.s0 = np.asarray(s0, dtype=np.float64)
        self.s1 = np.asarray(s1, dtype=np.float64)
        self.cell = float(cell)
        m = len(self.s0)
        if m == 0:
            self._buckets: dict[tuple[int, int], np.ndarray] = {}
            return
        mnx = np.minimum(self.s0[:, 0], self.s1[:, 0])
        mxx = np.maximum(self.s0[:, 0], self.s1[:, 0])
        mny = np.minimum(self.s0[:, 1], self.s1[:, 1])
        mxy = np.maximum(self.s0[:, 1], self.s1[:, 1])
        ix0 = np.floor(mnx / cell).astype(np.int64)
        ix1 = np.floor(mxx / cell).astype(np.int64)
        iy0 = np.floor(mny / cell).astype(np.int64)
        iy1 = np.floor(mxy / cell).astype(np.int64)
        # vectorized (segment, bucket) expansion — no per-segment loop
        ncx = ix1 - ix0 + 1
        ncy = iy1 - iy0 + 1
        counts = (ncx * ncy).astype(np.int64)
        seg_idx = np.repeat(np.arange(m, dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        rank = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
        rx = np.repeat(ncx, counts)
        gx = ix0[seg_idx] + rank % rx
        gy = iy0[seg_idx] + rank // rx
        key = gx * np.int64(0x9E3779B1) + gy  # packed bucket key
        order = np.argsort(key, kind="stable")
        key_s, seg_s, gx_s, gy_s = key[order], seg_idx[order], gx[order], gy[order]
        cut = np.nonzero(np.diff(key_s))[0] + 1
        bounds = np.concatenate(([0], cut, [len(key_s)]))
        self._buckets = {}
        for b in range(len(bounds) - 1):
            lo = bounds[b]
            self._buckets[(int(gx_s[lo]), int(gy_s[lo]))] = seg_s[bounds[b]:bounds[b + 1]]

    def _ring_candidates(self, gx: int, gy: int, r: int = 1) -> np.ndarray:
        out = []
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                b = self._buckets.get((gx + dx, gy + dy))
                if b is not None:
                    out.append(b)
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(out))

    def nearest(self, points: np.ndarray, max_dist: float):
        """Per point: (distance, segment index) of the nearest segment
        within ``max_dist`` (requires max_dist <= grid pitch); (inf, -1)
        when nothing is within the cap — the reference's ``knn_max_dist``
        cap semantics (osm_sidewalkreator.py:1703-1764).
        """
        pts = np.asarray(points, dtype=np.float64)
        n = len(pts)
        dist = np.full(n, np.inf)
        idx = np.full(n, -1, dtype=np.int64)
        if n == 0 or not self._buckets:
            return dist, idx
        g = np.floor(pts / self.cell).astype(np.int64)
        # group points by grid cell, vectorize within each group
        order = np.lexsort((g[:, 1], g[:, 0]))
        gs = g[order]
        breaks = np.nonzero((np.diff(gs[:, 0]) != 0) | (np.diff(gs[:, 1]) != 0))[0] + 1
        starts = np.concatenate(([0], breaks, [n]))
        for b in range(len(starts) - 1):
            sel = order[starts[b]:starts[b + 1]]
            gx, gy = int(gs[starts[b], 0]), int(gs[starts[b], 1])
            cand = self._ring_candidates(gx, gy)
            if len(cand) == 0:
                continue
            p = pts[sel]
            d = point_segment_dist(
                p[:, 0:1], p[:, 1:2],
                self.s0[cand, 0][None, :], self.s0[cand, 1][None, :],
                self.s1[cand, 0][None, :], self.s1[cand, 1][None, :])
            j = np.argmin(d, axis=1)
            dmin = d[np.arange(len(sel)), j]
            ok = dmin <= max_dist
            dist[sel[ok]] = dmin[ok]
            idx[sel[ok]] = cand[j[ok]]
        return dist, idx

    def query_bbox(self, mnx, mny, mxx, mxy) -> np.ndarray:
        """Candidate segment indices whose buckets intersect one bbox."""
        ix0 = int(np.floor(mnx / self.cell)); ix1 = int(np.floor(mxx / self.cell))
        iy0 = int(np.floor(mny / self.cell)); iy1 = int(np.floor(mxy / self.cell))
        out = []
        for gx in range(ix0, ix1 + 1):
            for gy in range(iy0, iy1 + 1):
                b = self._buckets.get((gx, gy))
                if b is not None:
                    out.append(b)
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(out))
