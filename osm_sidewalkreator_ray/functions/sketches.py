"""Mergeable sketches for corpus-scale statistics, next to the
HyperLogLog in ``aggregates.py``:

- **Misra-Gries heavy hitters** (Misra/Gries 1982; merge rule from
  Agarwal et al., "Mergeable Summaries", PODS'12): bounded-memory
  frequent-item counts. The exact ``token_topk`` groupby is the right
  call when the vocabulary fits a shuffle; at 10^12 documents the
  vocabulary itself is shuffle-sized, and an MG summary of k counters
  guarantees every item with count > n/(k+1) survives with count
  under-estimated by at most the tracked ``err``.
- **merging t-digest** (Dunning & Ertl, "Computing extremely accurate
  quantiles using t-digests"): mergeable quantile sketch for FLOAT
  columns, where the exact distinct-value histogram plan
  (``doc_length_quantiles``) would degenerate to one row per distinct
  value. Accuracy concentrates at the tails by the k1 scale function.

Scale shape for both: one small partial row per batch (k counters /
~delta centroids), driver merge of O(#batches) partials — nothing
proportional to row count or cardinality ever moves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


# ---------------------------------------------------- Misra-Gries

def _mg_compress(values: np.ndarray, counts: np.ndarray, k: int
                 ) -> tuple[np.ndarray, np.ndarray, int]:
    """Keep the k largest counters, subtracting the (k+1)-th count
    from the survivors (the MG decrement step, batched). Returns
    (values, counts, err_added) — err_added bounds the additional
    under-count of any item introduced by this compression."""
    if len(values) <= k:
        return values, counts, 0
    order = np.argsort(-counts, kind="stable")
    cut = int(counts[order[k]])
    keep = order[:k]
    new_counts = counts[keep] - cut
    pos = new_counts > 0
    return values[keep][pos], new_counts[pos], cut


def mg_heavy_hitters(ds, column: str, k_counters: int = 64,
                     topk: int = 10, split_tokens: bool = False
                     ) -> pd.DataFrame:
    """Distributed Misra-Gries top frequent values of ``column``
    (or of its whitespace tokens with ``split_tokens``). Per batch:
    exact in-batch counts -> MG-compressed to ``k_counters`` slim
    (value, count) rows + one err row; driver: sum counters, compress
    once more, report ``topk`` with [count_low, count_high] bounds
    (high = low + accumulated err). Guarantee: any value with true
    count > total/(k_counters+1) appears."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        col = b[column]
        if split_tokens:
            col = col.str.split().explode()
        vc = col.value_counts()
        v, c, err = _mg_compress(vc.index.to_numpy(dtype=object),
                                 vc.to_numpy(dtype=np.int64), k_counters)
        return pd.DataFrame({"value": np.append(v, [None]),
                             "count": np.append(c, [0]).astype(np.int64),
                             "err": np.int64(err),
                             "n": np.int64(int(vc.sum()))})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # one (err, n) pair per batch rode every row; each batch contributes
    # exactly one value=None marker row carrying its totals
    markers = parts[parts["value"].isna()]
    total_err = int(markers["err"].sum())
    total_n = int(markers["n"].sum())
    merged = (parts.dropna(subset=["value"])
              .groupby("value", sort=False)["count"].sum())
    v, c, err2 = _mg_compress(merged.index.to_numpy(dtype=object),
                              merged.to_numpy(dtype=np.int64), k_counters)
    total_err += err2
    order = np.lexsort((np.asarray(v, dtype=object), -c))[:topk]
    return pd.DataFrame({
        "value": np.asarray(v, dtype=object)[order],
        "count_low": c[order],
        "count_high": c[order] + total_err,
        "n_total": np.int64(total_n),
    }).reset_index(drop=True)


def mg_heavy_hitters_by(ds, key: str, column: str, k_counters: int = 64,
                        topk: int = 5, split_tokens: bool = False,
                        num_buckets: int = 32) -> pd.DataFrame:
    """Per-``key`` Misra-Gries heavy hitters (e.g. top tokens per
    language) — the grouped form on the bucketed-combine shape: MG
    partials per (key, batch) -> hash-bucketed groupby -> per-key
    counter sum + one more compression. Shuffle volume:
    (#keys x #batches x k_counters) slim rows."""
    empty = pd.DataFrame({key: pd.Series([], dtype=object),
                          "value": pd.Series([], dtype=object),
                          "count": pd.Series([], dtype=np.int64),
                          "err": pd.Series([], dtype=np.int64),
                          "__b": pd.Series([], dtype=np.int64)})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            # Ray Data can deliver zero-row blocks (e.g. downstream of
            # a filter); pd.concat([]) would raise
            return empty
        out = []
        for k, g in b.groupby(key, dropna=False, sort=False):
            col = g[column]
            if split_tokens:
                col = col.str.split().explode()
            vc = col.value_counts()
            v, c, err = _mg_compress(vc.index.to_numpy(dtype=object),
                                     vc.to_numpy(dtype=np.int64),
                                     k_counters)
            out.append(pd.DataFrame({
                key: k, "value": np.append(v, [None]),
                "count": np.append(c, [0]).astype(np.int64),
                "err": np.int64(err)}))
        o = pd.concat(out, ignore_index=True)
        o["__b"] = (pd.util.hash_array(o[key].to_numpy(dtype=object))
                    % num_buckets).astype(np.int64)
        return o

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, dropna=False, sort=False):
            err = int(gg.loc[gg["value"].isna(), "err"].sum())
            merged = (gg.dropna(subset=["value"])
                      .groupby("value", sort=False)["count"].sum())
            v, c, e2 = _mg_compress(merged.index.to_numpy(dtype=object),
                                    merged.to_numpy(dtype=np.int64),
                                    k_counters)
            err += e2
            order = np.lexsort((np.asarray(v, dtype=object), -c))[:topk]
            rows.append(pd.DataFrame({
                key: k, "value": np.asarray(v, dtype=object)[order],
                "count_low": c[order], "count_high": c[order] + err}))
        return pd.concat(rows, ignore_index=True)

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("__b").map_groups(combine, batch_format="pandas")
           .to_pandas())
    return (out.sort_values([key, "count_low"],
                            ascending=[True, False])
            .reset_index(drop=True))


# ---------------------------------------------------- t-digest

def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """Dunning's k1 scale function: centroid size limits shrink toward
    the tails, concentrating accuracy at extreme quantiles."""
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)


def _tdigest_compress(means: np.ndarray, weights: np.ndarray,
                      delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge of (sorted-by-mean) centroids under
    the k1 size bound — deterministic, O(n)."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_before / total
        q1 = (w_before + cur_w + w) / total
        if _k1(np.array([q1]), delta)[0] - _k1(np.array([q0]), delta)[0] <= 1.0:
            # merged centroid stays within one k-unit: absorb
            cur_m += (m - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


class TDigest:
    """Minimal merging t-digest over float values."""

    def __init__(self, delta: float = 200.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)

    @classmethod
    def of(cls, values: np.ndarray, delta: float = 200.0) -> "TDigest":
        v = np.sort(np.asarray(values, dtype=np.float64))
        if not len(v):
            return cls(delta)
        m, w = _tdigest_compress(v, np.ones(len(v)), delta)
        return cls(delta, m, w)

    def merge(self, other: "TDigest") -> "TDigest":
        if not len(other.means):
            return self
        if not len(self.means):
            return other
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        m, w = _tdigest_compress(m, w, self.delta)
        return TDigest(self.delta, m, w)

    def quantile(self, q: float) -> float:
        """Interpolated quantile: centroid i sits at the midpoint of
        its weight span (the standard t-digest estimator)."""
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, delta: float = 200.0) -> "TDigest":
        arr = np.frombuffer(blob, dtype=np.float64)
        half = len(arr) // 2
        return cls(delta, arr[:half].copy(), arr[half:].copy())


def tdigest_quantiles_by(ds, key: str, column: str,
                         qs: tuple[float, ...] = (0.5, 0.95),
                         delta: float = 200.0,
                         num_buckets: int = 32) -> pd.DataFrame:
    """Per-``key`` approximate quantiles — the grouped form of
    ``tdigest_quantiles`` on the ``hll_distinct_by`` shape: one digest
    row per (key, batch) partial, hash-bucketed groupby where each
    key's digests merge, quantiles interpolated in the combine.
    Shuffle volume: (#keys x #batches) ~delta-centroid rows —
    independent of row count."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out_k, out_d = [], []
        for k, g in b.groupby(key, dropna=False, sort=False):
            out_k.append(k)
            out_d.append(TDigest.of(g[column].to_numpy(np.float64),
                                    delta).to_bytes())
        o = pd.DataFrame({key: out_k, "digest": out_d})
        o["__b"] = (pd.util.hash_array(o[key].to_numpy(dtype=object))
                    % num_buckets).astype(np.int64)
        return o

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, dropna=False, sort=False):
            acc = TDigest(delta)
            for blob in gg["digest"]:
                acc = acc.merge(TDigest.from_bytes(blob, delta))
            rows.append({key: k, **{f"p{int(q * 100)}":
                                    round(acc.quantile(q), 6)
                                    for q in qs}})
        return pd.DataFrame(rows)

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("__b").map_groups(combine, batch_format="pandas")
           .to_pandas())
    return out.sort_values(key).reset_index(drop=True)


def tdigest_quantiles(ds, column: str, qs: tuple[float, ...] = (
        0.25, 0.5, 0.75, 0.95), delta: float = 200.0) -> pd.DataFrame:
    """Distributed approximate quantiles of a float column: one
    ~delta-centroid digest row per batch, driver merge, interpolated
    quantiles. The float-safe complement to the exact
    distinct-value-histogram plan."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = TDigest.of(b[column].to_numpy(dtype=np.float64), delta)
        return pd.DataFrame({"digest": [d.to_bytes()]})

    rows = ds.map_batches(partial, batch_format="pandas").to_pandas()
    acc = TDigest(delta)
    for blob in rows["digest"]:
        acc = acc.merge(TDigest.from_bytes(blob, delta))
    return pd.DataFrame({f"p{int(q * 100)}": [round(acc.quantile(q), 6)]
                         for q in qs})


def exact_quantile(ds, column: str, q: float,
                   max_collect: int = 65536,
                   max_rounds: int = 80) -> float:
    """EXACT interpolated quantile (SQL ``quantile_cont``; NaNs
    ignored) of a float column via DISTRIBUTED SELECTION — the exact
    counterpart to the t-digest (approximate) and
    distinct-value-histogram (int-only) plans. One bootstrap pass
    gets (valid count, min, max); a t-digest guess seeds the pivot;
    then each round is ONE counting pass (two slim numbers per batch)
    that bisects the value bracket containing the target order
    statistics; when the bracket holds <= ``max_collect`` rows they
    collect and the interpolation finishes exactly. Rounds are
    O(log(n/max_collect)) for non-degenerate data; massive ties
    resolve via the one-representable-value bracket branch (a single
    tied value IS both straddling order statistics)."""
    boot = ds.map_batches(
        lambda b: (lambda v: pd.DataFrame(
            {"n": [len(v)],
             "mn": [v.min() if len(v) else np.inf],
             "mx": [v.max() if len(v) else -np.inf]}))(
            b[column].to_numpy(dtype=np.float64)
            [~np.isnan(b[column].to_numpy(dtype=np.float64))]),
        batch_format="pandas").to_pandas()
    n_total = int(boot["n"].sum())
    if n_total == 0:
        raise ValueError("exact_quantile of an all-NaN/empty column")
    lo, hi = float(boot["mn"].min()), float(boot["mx"].max())

    # target: interpolated between 0-indexed floor(h) and ceil(h)
    h = (n_total - 1) * float(q)
    k_lo, k_hi = int(np.floor(h)), int(np.ceil(h))

    td = tdigest_quantiles(ds, column, qs=(q,))
    pivot = float(np.clip(float(td.iloc[0, 0]),
                          np.nextafter(lo, np.inf), hi))
    lo_count = 0          # rows strictly below lo

    for _ in range(max_rounds):
        def count_batch(b: pd.DataFrame, _lo=lo, _hi=hi,
                        _p=pivot) -> pd.DataFrame:
            v = b[column].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            inb = v[(v >= _lo) & (v <= _hi)]
            return pd.DataFrame({
                "below_p": [int((inb < _p).sum())],
                "in_bracket": [len(inb)]})

        c = ds.map_batches(count_batch,
                           batch_format="pandas").to_pandas()
        below_p = int(c["below_p"].sum())   # within bracket, < pivot
        in_bracket = int(c["in_bracket"].sum())

        if in_bracket <= max_collect:
            def grab(b: pd.DataFrame, _lo=lo, _hi=hi) -> pd.DataFrame:
                v = b[column].to_numpy(dtype=np.float64)
                v = v[~np.isnan(v)]
                return pd.DataFrame(
                    {"v": v[(v >= _lo) & (v <= _hi)]})

            vals = np.sort(ds.map_batches(
                grab, batch_format="pandas").to_pandas()["v"]
                .to_numpy(np.float64))
            x_lo = vals[k_lo - lo_count]
            x_hi = vals[k_hi - lo_count]
            return float(x_lo + (h - k_lo) * (x_hi - x_lo))

        # narrow: rows below the pivot globally = lo_count + below_p
        g = lo_count + below_p
        if g > k_hi:                        # BOTH targets are < pivot
            hi = np.nextafter(pivot, -np.inf)
        elif g <= k_lo:                     # BOTH targets are >= pivot
            lo, lo_count = pivot, g
        else:
            # k_lo < g <= k_hi (fractional h only): the pivot falls
            # BETWEEN the two interpolation order statistics — exactly
            # g = k_hi rows sit below it, so the largest below-pivot
            # value has rank k_lo and the smallest at/above-pivot value
            # has rank k_hi. Narrowing either bracket edge would drop
            # one of them (the former bug: IndexError at the collect);
            # instead one more slim pass (two numbers per batch) reads
            # both edges and finishes exactly.
            def edges(b: pd.DataFrame, _lo=lo, _hi=hi,
                      _p=pivot) -> pd.DataFrame:
                v = b[column].to_numpy(dtype=np.float64)
                v = v[~np.isnan(v)]
                inb = v[(v >= _lo) & (v <= _hi)]
                below = inb[inb < _p]
                atup = inb[inb >= _p]
                return pd.DataFrame({
                    "mx_below": [below.max() if len(below)
                                 else -np.inf],
                    "mn_at": [atup.min() if len(atup) else np.inf]})

            e = ds.map_batches(edges, batch_format="pandas").to_pandas()
            x_lo = float(e["mx_below"].max())
            x_hi = float(e["mn_at"].min())
            return float(x_lo + (h - k_lo) * (x_hi - x_lo))
        nxt = lo + (hi - lo) / 2.0
        if not (lo < nxt < hi) or nxt == pivot:
            # bracket narrowed to one representable value (ties):
            # both order statistics equal it
            return float(lo)
        pivot = nxt
    raise RuntimeError("exact_quantile did not converge "
                       f"in {max_rounds} rounds")


# ------------------------------------------------ Count-Min sketch

_CM_SEEDS = np.array([0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F,
                      0x165667B1], dtype=np.uint64)


def _cm_rows(values: np.ndarray, width: int) -> np.ndarray:
    """(depth, len(values)) column indices — Kirsch-Mitzenmacher
    double hashing off one 64-bit base hash, like the Bloom filter."""
    h = pd.util.hash_array(values)
    return np.stack([((h + s * h // np.uint64(2 ** 17 + 1)) * s
                      % np.uint64(width)).astype(np.int64)
                     for s in _CM_SEEDS])


def count_min(ds, column: str, width: int = 16384,
              depth: int = 5) -> np.ndarray:
    """Count-Min sketch (Cormode-Muthukrishnan, J.Alg 2005) of a key
    column: (depth, width) uint64 counter matrix. Per-batch partials
    are the SAME fixed-size matrix and merge by entrywise ADD (exactly
    like HLL's max-merge) — nothing cardinality-proportional moves;
    point estimates overcount by at most eps*N (eps ~ e/width) with
    probability 1-delta (delta ~ exp(-depth)). The point-frequency
    complement to Misra-Gries (which only tracks the head)."""
    depth = min(depth, len(_CM_SEEDS))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = np.zeros((depth, width), dtype=np.uint64)
        v = np.asarray(b[column])
        rows = _cm_rows(v, width)[:depth]
        for d in range(depth):
            np.add.at(m[d], rows[d], 1)
        return pd.DataFrame({"cm": [m.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    acc = np.zeros((depth, width), dtype=np.uint64)
    for blob in parts.get("cm", []):
        acc += np.frombuffer(blob, dtype=np.uint64) \
            .reshape(depth, width)
    return acc


def cm_estimate(sketch: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point-frequency estimates (min over rows) for ``values``."""
    depth, width = sketch.shape
    rows = _cm_rows(np.asarray(values), width)[:depth]
    return np.min(np.stack([sketch[d, rows[d]]
                            for d in range(depth)]), axis=0) \
        .astype(np.int64)


def exact_quantile_histogram(ds, column: str, qs: list[float],
                             max_distinct: int = 2_000_000
                             ) -> list[float]:
    """EXACT ``quantile_cont`` for BOUNDED-DISTINCT numeric columns in
    ONE streaming pass (vs exact_quantile's O(log) counting passes):
    per-batch (value, count) partials fold through the bucketed
    combiner, and the driver interpolates every requested q on the
    O(distinct) cumulative histogram. NaNs are ignored (SQL
    semantics). Raises ValueError when the distinct count exceeds
    ``max_distinct`` — callers fall back to the selection path, which
    is constant in driver memory."""
    from .aggregates import grouped_agg

    hist = grouped_agg(ds, [column], {"cnt": (None, "count")}) \
        .to_pandas()
    hist = hist[~hist[column].isna()]
    if len(hist) > max_distinct:
        raise ValueError(
            f"{len(hist)} distinct values > max_distinct="
            f"{max_distinct}; use exact_quantile")
    hist = hist.sort_values(column).reset_index(drop=True)
    v = hist[column].to_numpy(np.float64)
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n = int(cum[-1])

    def q_cont(q: float) -> float:
        h = (n - 1) * q
        lo = int(np.floor(h))
        hi = min(lo + 1, n - 1)
        x_lo = v[np.searchsorted(cum, lo + 1)]
        x_hi = v[np.searchsorted(cum, hi + 1)]
        return float(x_lo + (h - lo) * (x_hi - x_lo))

    return [q_cont(float(q)) for q in qs]
