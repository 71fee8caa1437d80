"""Deterministic weighted sampling without replacement.

``weighted_sample``: Efraimidis-Spirakis A-Res ("Weighted random
sampling with a reservoir", IPL 2006): give every row the key
``-log(u) / w`` (an Exp(w) draw — the n SMALLEST keys are a
weight-proportional sample without replacement) with ``u`` derived
from a Knuth multiplicative hash of the id column, not an RNG stream,
so the result is independent of batch boundaries, partitioning and
arrival order. Runs as per-batch partial top-n → driver merge of n
rows per batch — no shuffle, no corpus scan-and-drop; the same
shuffle-free shape as ``textops.sample_documents``, which stays the
uniform/SQL-oracle variant (log/pow are not bit-reproducible across
SQL engines, so this op's oracle is reference-equality, not DuckDB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["weighted_sample", "weighted_sample_by", "es_keys"]


def es_keys(ids: np.ndarray, weights: np.ndarray,
            seed: int) -> np.ndarray:
    """Efraimidis-Spirakis keys: Exp(w) draws from hash-derived
    uniforms. Zero/negative/NaN weights get +inf (never sampled)."""
    h = ((ids.astype(np.uint64) + np.uint64(seed))
         * np.uint64(2654435761)) % np.uint64(1 << 32)
    u = (h.astype(np.float64) + 1.0) / float(1 << 32)  # (0, 1]
    w = np.asarray(weights, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = -np.log(u) / w
    k[~(w > 0)] = np.inf
    return k


def weighted_sample(ds, id_col: str, weight_col: str, n: int,
                    seed: int = 42) -> pd.DataFrame:
    """n-row sample of ``ds`` with inclusion probability proportional
    to ``weight_col`` (without replacement), deterministic in
    (id, seed) alone. Returns the sampled rows sorted by id."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        k = es_keys(ids, b[weight_col].to_numpy(), seed)
        take = np.lexsort((ids, k))[:min(n, len(ids))]
        out = b.iloc[take].copy()
        out["__es"] = k[take]
        return out

    df = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if df.empty:
        return df
    df = df[np.isfinite(df["__es"])]
    df = df.sort_values(["__es", id_col], kind="mergesort").head(n)
    return (df.drop(columns="__es").sort_values(id_col)
            .reset_index(drop=True))


def weighted_sample_by(ds, group_col: str, id_col: str,
                       weight_col: str, n: int,
                       seed: int = 42) -> pd.DataFrame:
    """Per-group weighted sample without replacement: for every
    distinct ``group_col`` value, ``min(n, group size)`` rows with
    inclusion probability proportional to ``weight_col`` — the same
    Efraimidis-Spirakis hash-derived keys as ``weighted_sample``, so
    the result is deterministic in (id, seed) and independent of
    partitioning. Physical plan: per-batch per-group top-n partial
    (vectorized lexsort + groupby head — no shuffle), then a driver
    merge bounded by n x groups x blocks rows; for corpora where that
    bound is large, raise the block size or pre-bucket by group."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        k = es_keys(ids, b[weight_col].to_numpy(), seed)
        fin = np.isfinite(k)
        b, ids, k = b.iloc[fin], ids[fin], k[fin]
        if not len(b):
            return b.iloc[:0].assign(__es=np.array([], dtype=np.float64))
        out = b.copy()
        out["__es"] = k
        out = out.sort_values(["__es", id_col], kind="mergesort")
        return out.groupby(group_col, sort=False).head(n)

    df = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if df.empty:
        return df
    df = df.sort_values(["__es", id_col], kind="mergesort")
    df = df.groupby(group_col, sort=False).head(n)
    return (df.drop(columns="__es").sort_values([group_col, id_col])
            .reset_index(drop=True))
