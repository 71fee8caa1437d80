"""Probabilistic record linkage (Fellegi & Sunter, JASA 1969).

Entity resolution beyond exact/near dedup (cross-references
``textops.exact_dedup`` / MinHash family): two record tables are
blocked on a key, candidate pairs inside each block are compared on k
field-equality tests, and each pair gets a log-likelihood match
weight

    w = sum_k [ g_k * log2(m_k / u_k)
                + (1 - g_k) * log2((1 - m_k) / (1 - u_k)) ]

where g_k is the agreement indicator and m_k / u_k are the
conditional agreement probabilities among matches / non-matches.
m, u can be supplied or estimated unsupervised with the classic EM
over agreement-pattern counts (Winkler, ASA-SRMS 1988).

Scale design (the whole point of doing this on Ray Data):

- **Pair generation is one blocking-key co-partition** of slim rows
  (id + the k comparison fields) through the generic
  ``hash_partition_join`` — skewed blocks can be salted with its
  ``hot_keys`` machinery. Nothing else shuffles.
- **Pattern histogram is a fixed-size partial**: each batch emits at
  most 2^k (pattern, n) rows; one small groupby folds them. EM then
  runs on the driver over <= 2^k counts — O(1) driver state w.r.t.
  corpus size, same shape as the Bloom/HLL/MG partials elsewhere.
- **Weights attach with a 2^k lookup table** inside ``map_batches``
  (no re-shuffle, no per-row Python).

The reference repo has no linkage code; this is a from-scratch
implementation of the published model for the LLM-data-curation
family (dedup across sources, canonical entity tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _pair_fields(fields) -> list[tuple[str, str]]:
    out = [tuple(f) for f in fields]
    if not out or len(out) > 20:
        raise ValueError("fields must list 1..20 (col_a, col_b) pairs")
    for f in out:
        if len(f) != 2:
            raise ValueError(f"field spec {f!r} is not (col_a, col_b)")
    return out


def agreement_pairs_ds(a, b, on: str, fields,
                       id_a: str, id_b: str,
                       num_buckets: int = 32,
                       hot_keys: set | None = None,
                       n_salts: int = 8) -> "rd.Dataset":
    """Blocked candidate pairs with their agreement pattern.

    ``a`` / ``b``: Datasets (or DataFrames) sharing the blocking
    column ``on``; ``fields`` = [(col_a, col_b), ...] exact-equality
    comparisons (normalize/derive columns upstream — equality keeps
    the DuckDB oracle byte-exact). Returns slim rows
    (id_a, id_b, pattern) where pattern = sum_k g_k << k; the field
    values themselves never leave the join stage. Nulls never agree
    (SQL semantics: NULL = NULL is not a match).
    """
    from ..functions.joins import hash_partition_join

    fields = _pair_fields(fields)
    if isinstance(a, pd.DataFrame):
        a = rd.from_pandas(a)
    if isinstance(b, pd.DataFrame):
        b = rd.from_pandas(b)

    def slim_a(batch: pd.DataFrame) -> pd.DataFrame:
        out = {on: batch[on], "__ida": batch[id_a]}
        for i, (ca, _cb) in enumerate(fields):
            out[f"__fa{i}"] = batch[ca]
        return pd.DataFrame(out)

    def slim_b(batch: pd.DataFrame) -> pd.DataFrame:
        out = {on: batch[on], "__idb": batch[id_b]}
        for i, (_ca, cb) in enumerate(fields):
            out[f"__fb{i}"] = batch[cb]
        return pd.DataFrame(out)

    joined = hash_partition_join(
        a.map_batches(slim_a, batch_format="pandas"),
        b.map_batches(slim_b, batch_format="pandas"),
        on=on, num_buckets=num_buckets,
        hot_keys=hot_keys, n_salts=n_salts)

    n_fields = len(fields)

    def patterns(batch: pd.DataFrame) -> pd.DataFrame:
        pat = np.zeros(len(batch), dtype=np.int64)
        for i in range(n_fields):
            va = batch[f"__fa{i}"]
            vb = batch[f"__fb{i}"]
            agree = (va == vb) & va.notna() & vb.notna()
            pat |= agree.to_numpy(dtype=np.int64) << i
        return pd.DataFrame({"id_a": batch["__ida"].to_numpy(),
                             "id_b": batch["__idb"].to_numpy(),
                             "pattern": pat})

    return joined.map_batches(patterns, batch_format="pandas")


def pattern_histogram(pairs, n_fields: int) -> np.ndarray:
    """Counts of each of the 2^k agreement patterns — per-batch
    ``np.bincount`` partials (<= 2^k rows each), one small groupby."""
    size = 1 << n_fields

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(batch["pattern"].to_numpy(np.int64),
                        minlength=size)
        nz = np.nonzero(c)[0]
        return pd.DataFrame({"pattern": nz.astype(np.int64),
                             "n": c[nz].astype(np.int64)})

    agg = (pairs.map_batches(partial, batch_format="pandas")
           .groupby("pattern").sum("n").to_pandas())
    out = np.zeros(size, dtype=np.int64)
    out[agg["pattern"].to_numpy(np.int64)] = \
        agg["sum(n)"].to_numpy(np.int64)
    return out


def _pattern_bits(n_fields: int) -> np.ndarray:
    """(2^k, k) agreement-bit matrix g for every pattern index."""
    idx = np.arange(1 << n_fields, dtype=np.int64)
    return ((idx[:, None] >> np.arange(n_fields)[None, :]) & 1) \
        .astype(np.float64)


def em_fellegi_sunter(counts: np.ndarray, n_fields: int,
                      iters: int = 100, tol: float = 1e-9,
                      init_m: float = 0.9, init_u: float = 0.1,
                      init_p: float = 0.1) -> dict:
    """Driver-side EM over the 2^k pattern histogram (Winkler 1988):
    latent match/non-match classes with conditionally independent
    field agreements. Returns {"m", "u", "p", "iters"}; probabilities
    are clamped to [1e-6, 1-1e-6] for stability, and the classes are
    swapped if EM converges to the mirrored labeling (the guard keeps
    mean(m) >= mean(u), the standard identifiability convention)."""
    eps = 1e-6
    g = _pattern_bits(n_fields)  # (P, k)
    c = counts.astype(np.float64)
    total = c.sum()
    if total == 0:
        raise ValueError("empty pattern histogram")
    m = np.full(n_fields, init_m)
    u = np.full(n_fields, init_u)
    p = init_p
    last = None
    it = 0
    for it in range(1, iters + 1):
        log_m = g @ np.log(m) + (1 - g) @ np.log(1 - m)
        log_u = g @ np.log(u) + (1 - g) @ np.log(1 - u)
        a = np.log(p) + log_m
        b = np.log1p(-p) + log_u
        hi = np.maximum(a, b)
        w = np.exp(a - hi) / (np.exp(a - hi) + np.exp(b - hi))
        cm = c * w
        cu = c * (1 - w)
        p = float(np.clip(cm.sum() / total, eps, 1 - eps))
        m = np.clip(cm @ g / max(cm.sum(), eps), eps, 1 - eps)
        u = np.clip(cu @ g / max(cu.sum(), eps), eps, 1 - eps)
        ll = float((c * np.logaddexp(a, b)).sum())
        if last is not None and abs(ll - last) < tol * abs(last):
            break
        last = ll
    if m.mean() < u.mean():  # mirrored labeling
        m, u, p = u, m, 1 - p
    return {"m": m, "u": u, "p": p, "iters": it}


def pattern_weights(m: np.ndarray, u: np.ndarray) -> np.ndarray:
    """log2 match weight per pattern index — the 2^k lookup table."""
    m = np.asarray(m, dtype=np.float64)
    u = np.asarray(u, dtype=np.float64)
    g = _pattern_bits(len(m))
    return (g @ np.log2(m / u)
            + (1 - g) @ np.log2((1 - m) / (1 - u)))


def fs_weights_ds(pairs, m, u) -> "rd.Dataset":
    """Attach the Fellegi-Sunter weight to (id_a, id_b, pattern) rows
    via the 2^k lookup — no shuffle, no per-row Python."""
    table = pattern_weights(m, u)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["weight"] = table[batch["pattern"].to_numpy(np.int64)]
        return batch

    return pairs.map_batches(attach, batch_format="pandas")


def record_linkage(a, b, on: str, fields, id_a: str, id_b: str,
                   m=None, u=None, threshold: float = 0.0,
                   num_buckets: int = 32,
                   hot_keys: set | None = None,
                   em_iters: int = 100) -> "rd.Dataset":
    """End-to-end linkage: block -> compare -> (EM if m/u absent) ->
    weight -> classify. Returns a streaming Dataset of
    (id_a, id_b, pattern, weight, is_match); with EM the pairs
    Dataset is materialized once so the histogram pass and the weight
    pass share one execution."""
    pairs = agreement_pairs_ds(a, b, on, fields, id_a, id_b,
                               num_buckets=num_buckets,
                               hot_keys=hot_keys)
    n_fields = len(_pair_fields(fields))
    if m is None or u is None:
        pairs = pairs.materialize()
        est = em_fellegi_sunter(pattern_histogram(pairs, n_fields),
                                n_fields, iters=em_iters)
        m, u = est["m"], est["u"]
    weighted = fs_weights_ds(pairs, m, u)

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["is_match"] = batch["weight"] >= threshold
        return batch

    return weighted.map_batches(classify, batch_format="pandas")
