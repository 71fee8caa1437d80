"""Global-order window primitives: distributed prefix sums and ranks.

Per-PARTITION windows (LAG, sessionize, as-of) are already covered by
the bucketed ``groupby(key).map_groups`` shape in
``pipelines/relational.py`` — each partition fits one group. The ops
here are the other family SQL calls ``OVER (ORDER BY ...)`` with NO
partition key: a running total / global rank over the whole corpus,
where no single worker may ever see the whole ordered input.

Plan (same shape as ``textops.pack_sequences``, generalized): the order
column is split into ORDERED key ranges (``bucket = floor(key /
bucket_width)`` — bucket ids inherit the key order); each bucket group
computes its intra-bucket running value and emits one (bucket, total)
side row; the driver folds the O(#buckets) totals into EXCLUSIVE bucket
offsets and broadcasts them (``ray.put`` once, not per batch); a final
streaming map adds offset + intra value. Driver state is O(#buckets) —
at 100 TB pick ``bucket_width`` so #buckets stays ~10^5; the corpus
itself never collects and the only shuffle is the bucket co-group.

A skewed order key (one bucket holding most rows) degrades the
co-group, exactly like any groupby; callers with pathological key
distributions should pick quantile-based bucket edges instead (the
``bucket_edges`` argument).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

__all__ = ["running_agg", "running_sum", "global_rank",
           "ntile_of_rank", "quantile_bucket_edges"]


def _bucket_ids(key: np.ndarray, bucket_width: float,
                bucket_edges: np.ndarray | None) -> np.ndarray:
    if bucket_edges is not None:
        return np.searchsorted(bucket_edges, key, side="right") \
            .astype(np.int64)
    return np.floor(key / bucket_width).astype(np.int64)


_OPS = {
    "sum": (pd.Series.cumsum, "sum", np.cumsum, np.add, 0.0),
    "max": (pd.Series.cummax, "max", np.maximum.accumulate,
            np.maximum, -np.inf),
    "min": (pd.Series.cummin, "min", np.minimum.accumulate,
            np.minimum, np.inf),
}


def running_agg(ds, order_col: str, value_col: str, out_col: str,
                op: str = "sum", bucket_width: float = 1.0,
                bucket_edges: np.ndarray | None = None,
                tie_cols: list[str] | None = None):
    """Add ``out_col`` = running ``op`` (sum/min/max — any associative
    fold with an identity works on this plan) of ``value_col`` over
    rows ordered globally by ``order_col`` (ties broken by
    ``tie_cols`` so the result is deterministic; with no tie_cols,
    ties must be absent or the caller must not care about intra-tie
    attribution — SQL's ``SUM() OVER (ORDER BY k)`` gives all ties
    the same PEER total, which callers get by aggregating per key
    first).

    Returns a Dataset with the input columns plus ``out_col``. Output
    blocks are the per-bucket groups (disjoint ordered key ranges).
    """
    cum_pd, agg_name, cum_np, combine, ident = _OPS[op]
    sort_cols = [order_col] + (tie_cols or [])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__wb"] = _bucket_ids(
            b[order_col].to_numpy(dtype=np.float64),
            bucket_width, bucket_edges)
        return b

    def intra(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        g = g.copy()
        g["__intra"] = cum_pd(g[value_col])
        return g

    # materialized: per_bucket is consumed TWICE (the bucket-totals
    # collect below and the returned finalize stage); without the pin
    # the tag+shuffle — and every upstream stage — would re-execute on
    # the second consumption
    per_bucket = (ds.map_batches(tag, batch_format="pandas")
                  .groupby("__wb").map_groups(intra,
                                              batch_format="pandas")
                  .materialize())

    # O(#buckets) driver fold: bucket totals -> exclusive prefix folds
    # (an all-empty Dataset collects to a columnLESS frame — guard)
    tp = per_bucket.map_batches(
        lambda b: b.groupby("__wb", as_index=False)
        .agg(__t=(value_col, agg_name)),
        batch_format="pandas").to_pandas()
    if tp.empty or "__wb" not in tp.columns:
        offs: dict = {}
    else:
        totals = (tp.groupby("__wb", as_index=False)["__t"]
                  .agg(agg_name).sort_values("__wb"))
        run = cum_np(totals["__t"].to_numpy(dtype=np.float64))
        offs = dict(zip(
            totals["__wb"].to_numpy(),
            np.concatenate([[ident], run[:-1]])))
    off_ref = ray.put(offs)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(off_ref)
        b = b.copy()
        b[out_col] = combine(
            b["__wb"].map(offsets).to_numpy(np.float64),
            b["__intra"].to_numpy(np.float64))
        return b.drop(columns=["__wb", "__intra"])

    return per_bucket.map_batches(finalize, batch_format="pandas")


def running_sum(ds, order_col: str, value_col: str, out_col: str,
                bucket_width: float = 1.0,
                bucket_edges: np.ndarray | None = None,
                tie_cols: list[str] | None = None):
    """``running_agg(..., op="sum")`` — kept as the named common case."""
    return running_agg(ds, order_col, value_col, out_col, op="sum",
                       bucket_width=bucket_width,
                       bucket_edges=bucket_edges, tie_cols=tie_cols)


def global_rank(ds, order_cols: list[str], out_col: str = "rank",
                bucket_width: float = 1.0,
                bucket_edges: np.ndarray | None = None):
    """Add ``out_col`` = 1-based ROW_NUMBER over rows ordered globally
    by ``order_cols`` (the FIRST order col drives the range bucketing;
    remaining cols break ties inside a bucket, so the full tuple must
    be a total order for determinism). Same prefix plan as
    ``running_sum`` with value ≡ 1, specialized so the driver folds
    COUNTS, and returns the total row count alongside (rank consumers
    like NTILE need N)."""
    first = order_cols[0]

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__wb"] = _bucket_ids(
            b[first].to_numpy(dtype=np.float64),
            bucket_width, bucket_edges)
        return b

    def intra(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").copy()
        g["__intra"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    # materialized for the same two-consumer reason as running_agg
    per_bucket = (ds.map_batches(tag, batch_format="pandas")
                  .groupby("__wb").map_groups(intra,
                                              batch_format="pandas")
                  .materialize())

    cp = per_bucket.map_batches(
        lambda b: b.groupby("__wb", as_index=False)
        .agg(__n=(first, "size")), batch_format="pandas").to_pandas()
    if cp.empty or "__wb" not in cp.columns:
        n_total, offs = 0, {}
    else:
        counts = (cp.groupby("__wb", as_index=False)["__n"].sum()
                  .sort_values("__wb"))
        n_total = int(counts["__n"].sum())
        offs = dict(zip(
            counts["__wb"].to_numpy(),
            np.concatenate([[0], counts["__n"].cumsum()
                            .to_numpy(dtype=np.int64)[:-1]])))
    off_ref = ray.put(offs)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(off_ref)
        b = b.copy()
        b[out_col] = b["__wb"].map(offsets).to_numpy(np.int64) \
            + b["__intra"].to_numpy(np.int64)
        return b.drop(columns=["__wb", "__intra"])

    return per_bucket.map_batches(finalize, batch_format="pandas"), \
        n_total


def ntile_of_rank(rank: np.ndarray, n_total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from a 1-based global rank: the first ``n_total %
    k`` tiles get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` —
    vectorized, exact SQL semantics."""
    q, r = divmod(n_total, k)
    r0 = np.asarray(rank, dtype=np.int64) - 1  # 0-based
    boundary = r * (q + 1)
    big = r0 < boundary
    out = np.empty(len(r0), dtype=np.int64)
    out[big] = r0[big] // (q + 1) + 1
    if q > 0:
        out[~big] = (r0[~big] - boundary) // q + r + 1
    return out


def quantile_bucket_edges(ds, col: str, n_edges: int = 255,
                          delta: float = 400.0) -> np.ndarray:
    """Approximate equi-depth edges for ``bucket_edges`` — the
    skewed-order-key companion to ``running_sum`` / ``global_rank``
    (their module docstring's caveat): fixed-width buckets degrade
    when most keys pile into one range, so compute n_edges
    equi-DEPTH cut points from one streaming t-digest pass
    (``functions.sketches.TDigest``: ~delta-centroid partial per
    batch, driver merge — constant driver state, corpus never
    collects) and bucket by ``searchsorted`` instead. Edges are
    approximate; correctness is unaffected (any monotone bucketing
    preserves prefix-sum order), only balance is."""
    from .sketches import TDigest

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        d = TDigest.of(v, delta)
        return pd.DataFrame({"digest": [d.to_bytes()]})

    rows = ds.map_batches(partial, batch_format="pandas").to_pandas()
    acc = TDigest(delta)
    if not rows.empty and "digest" in rows.columns:
        for blob in rows["digest"]:
            acc = acc.merge(TDigest.from_bytes(blob, delta))
    if len(acc.means) == 0:
        return np.array([0.0])
    qs = np.linspace(0.0, 1.0, n_edges + 2)[1:-1]
    edges = np.array([acc.quantile(q) for q in qs], dtype=np.float64)
    return np.unique(edges)
