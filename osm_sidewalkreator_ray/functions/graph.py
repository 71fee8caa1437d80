"""Distributed iterative graph operators.

``connected_components``: min-label propagation over an edge Dataset
(the HCC/"hash-to-min" family: Kang et al. PEGASUS, ICDM'09;
Rastogi et al., ICDE'13) —
the canonical way to turn near-dup PAIRS into dedup DECISIONS (keep
one representative per duplicate cluster). Each iteration is one
bucketed shuffle of slim (vertex, label) rows; no step ever holds the
full edge set or label set in one process, so the op scales with the
cluster, and converges in O(component diameter) rounds (near-dup
clusters are shallow — 2-4 rounds in practice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _to_edge_ds(edges) -> "rd.Dataset":
    if isinstance(edges, pd.DataFrame):
        return rd.from_pandas(edges[["src", "dst"]])
    return edges


def connected_components(edges, num_buckets: int = 32,
                         max_iters: int = 50) -> pd.DataFrame:
    """Edges (src, dst int64 Dataset or DataFrame) -> components.

    Returns one row per vertex: (vertex, component) with
    ``component = min vertex id of its connected component``.

    Physical plan per iteration: labels are bucketed by
    ``hash(vertex) % B``; the (undirected) edge list is bucketed the
    same way ON ITS SOURCE endpoint once, up front. One groupby brings
    a bucket's labels and edges together, where a vectorized pandas
    merge relabels each destination with the min over incoming source
    labels. A driver-side sum of labels (one tiny aggregate; labels
    only ever decrease) detects the fixpoint.
    """
    edges = _to_edge_ds(edges)

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        src = np.concatenate([b["src"].to_numpy(), b["dst"].to_numpy()])
        dst = np.concatenate([b["dst"].to_numpy(), b["src"].to_numpy()])
        return pd.DataFrame({
            "bucket": (pd.util.hash_array(src) % num_buckets)
            .astype(np.int64),
            "src": src.astype(np.int64), "dst": dst.astype(np.int64),
            "label": np.full(len(src), -1, dtype=np.int64),
            "is_edge": np.ones(len(src), dtype=bool)})

    edge_rows = edges.map_batches(undirect,
                                  batch_format="pandas").materialize()
    if edge_rows.count() == 0:
        return pd.DataFrame({"vertex": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})

    def init_labels(b: pd.DataFrame) -> pd.DataFrame:
        v = np.unique(np.concatenate([b["src"].to_numpy(),
                                      b["dst"].to_numpy()]))
        return pd.DataFrame({"vertex": v, "label": v})

    def _as_labels(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "vertex": b["vertex"].to_numpy().astype(np.int64),
            "label": b["min(label)"].to_numpy().astype(np.int64)})

    # native vectorized groupby-min (NOT map_groups: that would cost
    # one Python call per vertex)
    labels = (edge_rows.map_batches(init_labels, batch_format="pandas")
              .groupby("vertex").min("label")
              .map_batches(_as_labels, batch_format="pandas")
              .materialize())

    def tag_labels(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (pd.util.hash_array(b["vertex"].to_numpy())
                       % num_buckets).astype(np.int64),
            "src": b["vertex"].to_numpy(),
            "dst": np.full(len(b), -1, dtype=np.int64),
            "label": b["label"].to_numpy(),
            "is_edge": np.zeros(len(b), dtype=bool)})

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[~g["is_edge"], ["src", "label"]] \
            .rename(columns={"src": "vertex"})
        e = g.loc[g["is_edge"], ["src", "dst"]]
        prop = e.merge(lab, left_on="src", right_on="vertex")
        cand = (prop.groupby("dst", as_index=False)["label"].min()
                .rename(columns={"dst": "vertex"}))
        return pd.concat([lab, cand], ignore_index=True)

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        tagged = labels.map_batches(tag_labels, batch_format="pandas")
        merged = (edge_rows.union(tagged).groupby("bucket")
                  .map_groups(propagate, batch_format="pandas"))
        # candidate labels for a vertex arrive from every bucket its
        # neighbors hash to — a second keyed min makes them global
        labels = (merged.groupby("vertex").min("label")
                  .map_batches(_as_labels, batch_format="pandas")
                  .materialize())
        s = labels.map_batches(
            lambda b: pd.DataFrame({"s": [int(b["label"].sum())]}),
            batch_format="pandas").to_pandas()["s"].sum()
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # min-label propagation needs O(diameter) rounds; silently
        # returning here would SPLIT any component whose diameter
        # exceeds max_iters (e.g. a >max_iters-long chain of templated
        # near-dup pages) into several keep-representatives. Fail loud;
        # callers with pathological chains should raise max_iters (or
        # switch to a hash-to-min / pointer-doubling variant, Rastogi
        # et al. ICDE'13, whose rounds scale with log diameter).
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "iterations (component diameter exceeds max_iters); "
            "raise max_iters")
    df = labels.to_pandas().rename(columns={"label": "component"})
    return df.sort_values("vertex").reset_index(drop=True)
