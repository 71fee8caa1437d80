"""Vectorized candidate-pair generation for inverted-index dedup.

Given parallel (key, id) arrays — one row per posting — emit the
unordered id pairs that share a key. The naive
``for _, sub in df.groupby(key)`` costs one Python iteration per
DISTINCT key (hundreds of thousands per bucket); here the unique-key
scan is a single numpy pass and Python only touches keys with >= 2
postings (the near-dup shingles/buckets — orders of magnitude fewer).
"""

from __future__ import annotations

import numpy as np


def pairs_sharing_key(keys: np.ndarray, ids: np.ndarray,
                      max_group: int | None = None
                      ) -> tuple[np.ndarray, np.ndarray]:
    """-> (a, b) int64 arrays, a < b per pair; pairs may repeat if two
    ids share several keys (caller dedups/aggregates)."""
    if len(keys) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    d = ids[order]
    # group boundaries in one pass
    bound = np.empty(len(k), dtype=bool)
    bound[0] = True
    bound[1:] = k[1:] != k[:-1]
    starts = np.nonzero(bound)[0]
    counts = np.diff(np.append(starts, len(k)))
    sel = counts >= 2
    if max_group is not None:
        sel &= counts <= max_group
    a_l, b_l = [], []
    for s, c in zip(starts[sel], counts[sel]):
        grp = np.sort(d[s:s + c])
        ii, jj = np.triu_indices(c, k=1)
        a_l.append(grp[ii])
        b_l.append(grp[jj])
    if not a_l:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return (np.concatenate(a_l).astype(np.int64),
            np.concatenate(b_l).astype(np.int64))
