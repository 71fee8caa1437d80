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


def pagerank(edges, damping: float = 0.85, iters: int = 20,
             num_buckets: int = 32):
    """Distributed PageRank over a directed edge Dataset/DataFrame
    (src, dst int64) — the canonical iterative graph op beside
    ``connected_components`` (PEGASUS, Kang et al. ICDM'09: PR as
    repeated sparse matvec). Returns (vertex, rank) as a pandas
    DataFrame (ranks sum to 1).

    Physical plan: edge rows carry ``w = 1/outdeg(src)`` and are
    bucketed by ``hash(src) % B`` ONCE up front; each iteration (a)
    co-groups current (vertex, rank) rows into the same buckets and
    emits per-bucket PRE-SUMMED (dst, contrib) partials, (b) one
    grouped sum by dst (slim rows, vertex-sized), (c) re-ranks every
    vertex as (1-d)/N + d*(in_sum + dangling/N). The dangling mass
    needs NO flags or extra pass: outgoing mass conservation gives
    dangling = sum(ranks) - sum(contribs), a scalar the driver reads
    from one tiny aggregate. Per-iteration driver state is O(1);
    shuffled rows are always slim (id, float) pairs, never the edge
    payload."""
    edges = _to_edge_ds(edges)

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        src = b["src"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (pd.util.hash_array(src) % num_buckets)
            .astype(np.int64),
            "src": src, "dst": b["dst"].to_numpy(np.int64),
            "val": np.zeros(len(b), dtype=np.float64),
            "is_edge": np.ones(len(b), dtype=bool)})

    edge_rows = edges.map_batches(tag_edges,
                                  batch_format="pandas").materialize()
    if edge_rows.count() == 0:
        return pd.DataFrame({"vertex": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})

    # out-degrees -> edge weight 1/deg, attached once (static)
    def partial_deg(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["bucket", "src"], as_index=False).size()
        return g.rename(columns={"size": "deg"})

    def fold_deg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("src", as_index=False)["deg"].sum() \
            .assign(bucket=g["bucket"].iloc[0])

    degs = (edge_rows.map_batches(partial_deg, batch_format="pandas")
            .groupby("bucket").map_groups(fold_deg,
                                          batch_format="pandas"))

    def weight_edges(g: pd.DataFrame) -> pd.DataFrame:
        e = g.loc[g["is_edge"]]
        d = g.loc[~g["is_edge"], ["src", "val"]] \
            .rename(columns={"val": "inv"})
        out = e.merge(d, on="src")
        out["val"] = out["inv"]
        return out[["bucket", "src", "dst", "val", "is_edge"]]

    deg_rows = degs.map_batches(
        lambda b: pd.DataFrame({
            "bucket": b["bucket"].to_numpy(np.int64),
            "src": b["src"].to_numpy(np.int64),
            "dst": np.full(len(b), -1, dtype=np.int64),
            "val": 1.0 / b["deg"].to_numpy(np.float64),
            "is_edge": np.zeros(len(b), dtype=bool)}),
        batch_format="pandas")
    weighted = (edge_rows.union(deg_rows).groupby("bucket")
                .map_groups(weight_edges,
                            batch_format="pandas").materialize())

    # vertex set = distinct endpoints (native groupby, no Python/row)
    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        v = np.unique(np.concatenate([b["src"].to_numpy(np.int64),
                                      b["dst"].to_numpy(np.int64)]))
        return pd.DataFrame({"vertex": v})

    vertices = (edge_rows.map_batches(endpoints, batch_format="pandas")
                .groupby("vertex").count()
                .map_batches(lambda b: pd.DataFrame(
                    {"vertex": b["vertex"].to_numpy(np.int64)}),
                    batch_format="pandas").materialize())
    n = vertices.count()

    ranks = vertices.map_batches(
        lambda b: pd.DataFrame({
            "vertex": b["vertex"].to_numpy(np.int64),
            "rank": np.full(len(b), 1.0 / n, dtype=np.float64)}),
        batch_format="pandas").materialize()

    def tag_ranks(b: pd.DataFrame) -> pd.DataFrame:
        v = b["vertex"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": (pd.util.hash_array(v) % num_buckets)
            .astype(np.int64),
            "src": v, "dst": np.full(len(b), -1, dtype=np.int64),
            "val": b["rank"].to_numpy(np.float64),
            "is_edge": np.zeros(len(b), dtype=bool)})

    def contribute(g: pd.DataFrame) -> pd.DataFrame:
        r = g.loc[~g["is_edge"], ["src", "val"]] \
            .rename(columns={"val": "r"})
        e = g.loc[g["is_edge"], ["src", "dst", "val"]]
        m = e.merge(r, on="src")
        m["c"] = m["val"] * m["r"]
        # pre-sum inside the bucket: one slim row per dst leaves it
        return m.groupby("dst", as_index=False)["c"].sum()

    from .aggregates import grouped_agg

    for _ in range(iters):
        tagged = ranks.map_batches(tag_ranks, batch_format="pandas")
        contribs = grouped_agg(
            weighted.union(tagged).groupby("bucket")
            .map_groups(contribute, batch_format="pandas"),
            ["dst"], {"c": ("c", "sum")}).materialize()
        total_in = contribs.sum("c") if contribs.count() else 0.0
        dangling = max(0.0, 1.0 - float(total_in))

        def new_rank(g: pd.DataFrame, _n=n, _d=damping,
                     _dang=dangling) -> pd.DataFrame:
            v = g.loc[~g["is_edge"], ["src"]] \
                .rename(columns={"src": "vertex"})
            c = g.loc[g["is_edge"], ["dst", "val"]] \
                .rename(columns={"dst": "vertex", "val": "c"})
            out = v.merge(c, on="vertex", how="left")
            cc = out["c"].fillna(0.0).to_numpy(np.float64)
            out["rank"] = (1.0 - _d) / _n + _d * (cc + _dang / _n)
            return out[["vertex", "rank"]]

        # vertices ride as rank-less tag rows; contribs as edge-ish
        # rows keyed by dst — one co-group rebuilds every rank
        vtag = vertices.map_batches(
            lambda b: pd.DataFrame({
                "bucket": (pd.util.hash_array(
                    b["vertex"].to_numpy(np.int64)) % num_buckets)
                .astype(np.int64),
                "src": b["vertex"].to_numpy(np.int64),
                "dst": np.full(len(b), -1, dtype=np.int64),
                "val": np.zeros(len(b), dtype=np.float64),
                "is_edge": np.zeros(len(b), dtype=bool)}),
            batch_format="pandas")
        ctag = contribs.map_batches(
            lambda b: pd.DataFrame({
                "bucket": (pd.util.hash_array(
                    b["dst"].to_numpy(np.int64)) % num_buckets)
                .astype(np.int64),
                "src": np.full(len(b), -1, dtype=np.int64),
                "dst": b["dst"].to_numpy(np.int64),
                "val": b["c"].to_numpy(np.float64),
                "is_edge": np.ones(len(b), dtype=bool)}),
            batch_format="pandas")
        ranks = (vtag.union(ctag).groupby("bucket")
                 .map_groups(new_rank,
                             batch_format="pandas").materialize())

    df = ranks.to_pandas()
    df["vertex"] = df["vertex"].astype("int64")
    return df.sort_values("vertex").reset_index(drop=True)
