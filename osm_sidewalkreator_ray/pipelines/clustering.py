"""Distributed k-means over an embedding column.

Three pieces, each a streaming pass over the Dataset:

- **init — k-means||** (Bahmani et al., "Scalable k-means++", VLDB
  2012): O(rounds) passes; each pass samples new candidate centers
  with probability ``min(1, oversample * d2(x) / phi)`` where ``d2``
  is the squared distance to the current candidate set and ``phi``
  the cost from the previous pass (the standard overlapped variant —
  cost and sample share one pass). The Bernoulli draw is a pure
  function of ``(vec_id, round, seed)`` (Knuth-mix hash, the
  `graph.random_walks` trick), so the candidate set is independent of
  partitioning, arrival order and task retries. The (small) weighted
  candidate set is reduced to exactly ``k`` seeds with weighted
  k-means++ on the driver.
- **iterate — Lloyd**: per batch, one matmul assigns every vector to
  its nearest broadcast centroid; a scatter-add produces slim
  long-form partials (cluster, dim, s, c) — cardinality k x d per
  batch, never the vectors — folded by `grouped_agg`; the driver
  updates the k x d centroid matrix and stops on ``tol`` or
  ``n_iter``. An emptied cluster keeps its previous centroid
  (deterministic; no resampling mid-run).
- **assign**: one `map_batches` against the broadcast final
  centroids -> ``(id, cluster, sq_dist)``.

Scale notes: the input projection (id, embedding) is materialized
once into the object store before iterating (iterative ML's standard
trade — pay the read once, let Ray spill), centroids move driver ->
workers once per pass via ``ray.put`` (k x d floats, tiny), and
everything that leaves a task is either k x d partial sums or one
row per point at the final assign.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.aggregates import grouped_agg


def _u01(ids: np.ndarray, rnd: int, seed: int) -> np.ndarray:
    """Deterministic per-(id, round, seed) uniform in [0, 1)."""
    with np.errstate(over="ignore"):
        x = (ids.astype(np.uint64)
             + np.uint64(rnd) * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(seed + 1) * np.uint64(0xC2B2AE3D27D4EB4F))
        # full murmur3 fmix64: the earlier half-finalizer (one
        # multiply + xorshift) left sequential ids clustered in a
        # ~[0.43, 0.67] band, so any keep-probability below ~0.43
        # sampled NOTHING — k-means|| rounds silently under-sampled
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        x = x ^ (x >> np.uint64(33))
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _emb_matrix(batch: pd.DataFrame, emb_col: str) -> np.ndarray:
    return np.stack(batch[emb_col].to_numpy()).astype(np.float64)


def _nearest(m: np.ndarray, cents: np.ndarray):
    """(idx, sqdist) of the nearest row of ``cents`` for each row of
    ``m`` — one matmul: ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2."""
    d2 = (np.einsum("ij,ij->i", m, m)[:, None]
          - 2.0 * (m @ cents.T)
          + np.einsum("ij,ij->i", cents, cents)[None, :])
    idx = np.argmin(d2, axis=1)
    best = np.maximum(d2[np.arange(len(m)), idx], 0.0)
    return idx, best


def _slim(ds, id_col: str, emb_col: str):
    return ds.select_columns([id_col, emb_col]).materialize()


def kmeans_init(ds, k: int, *, seed: int = 0, rounds: int = 5,
                oversample: float | None = None,
                id_col: str = "vec_id", emb_col: str = "embedding",
                _materialized: bool = False) -> np.ndarray:
    """k-means|| seeding: returns a (k, d) float64 centroid matrix.
    Raises if the candidate pool ends up smaller than ``k`` (tiny or
    degenerate inputs — fall back to a smaller k)."""
    if not _materialized:
        ds = _slim(ds, id_col, emb_col)
    ell = float(oversample if oversample is not None else 2 * k)

    # seed candidate: the point with the globally smallest
    # (hash, id) — one slim pass, one row per batch leaves a task
    def first(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"u": pd.Series([], dtype="float64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 emb_col: pd.Series([], dtype=object)})
        ids = b[id_col].to_numpy(np.int64)
        u = _u01(ids, 0, seed)
        i = np.lexsort((ids, u))[0]
        return b.iloc[[i]].assign(u=u[i])[["u", id_col, emb_col]]

    cand_df = (ds.map_batches(first, batch_format="pandas").to_pandas()
               .sort_values(["u", id_col]).head(1))
    if cand_df.empty:
        raise ValueError("kmeans_init: empty input dataset")
    cands = np.asarray([np.asarray(cand_df[emb_col].iloc[0],
                                   dtype=np.float64)])

    def sample(b: pd.DataFrame, c_ref, rnd: int,
               phi: float) -> pd.DataFrame:
        empty = pd.DataFrame({"kind": pd.Series([], dtype="int64"),
                              id_col: pd.Series([], dtype="int64"),
                              emb_col: pd.Series([], dtype=object),
                              "d2": pd.Series([], dtype="float64")})
        if not len(b):
            return empty
        cents = ray.get(c_ref)
        m = _emb_matrix(b, emb_col)
        ids = b[id_col].to_numpy(np.int64)
        _, d2 = _nearest(m, cents)
        keep = _u01(ids, rnd, seed) < np.minimum(
            1.0, ell * d2 / max(phi, 1e-300))
        out = b.loc[keep, [id_col, emb_col]].assign(kind=1, d2=0.0)
        # one cost marker row per batch (kind=0) carries sum(d2)
        marker = pd.DataFrame({"kind": [0], id_col: [-1],
                               emb_col: [b[emb_col].iloc[0]],
                               "d2": [float(d2.sum())]})
        return pd.concat([marker, out[["kind", id_col, emb_col, "d2"]]],
                         ignore_index=True)

    # k-means|| (Bahmani et al. 2012): each round samples with
    # probability ell*d2/phi where phi is the CURRENT cost. Seeding
    # phi = inf made round 1 a pure cost pass that sampled nothing
    # (rounds=1 was unusable, and every call burned a wasted pass);
    # instead pay one explicit SLIM cost pass (one float per batch, no
    # embedding payload moves) so all ``rounds`` sampling rounds are
    # real.
    def cost_only(b: pd.DataFrame, c_ref) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"d2": pd.Series([], dtype="float64")})
        _, d2 = _nearest(_emb_matrix(b, emb_col), ray.get(c_ref))
        return pd.DataFrame({"d2": [float(d2.sum())]})

    c_ref0 = ray.put(cands)
    phi = float(ds.map_batches(
        functools.partial(cost_only, c_ref=c_ref0),
        batch_format="pandas").to_pandas()["d2"].sum())
    for rnd in range(1, rounds + 1):
        if phi == 0.0:
            break
        c_ref = ray.put(cands)
        got = ds.map_batches(
            functools.partial(sample, c_ref=c_ref, rnd=rnd, phi=phi),
            batch_format="pandas").to_pandas()
        phi = float(got.loc[got["kind"] == 0, "d2"].sum())
        new = got[got["kind"] == 1].sort_values(id_col)
        if len(new):
            cands = np.vstack(
                [cands, np.stack(new[emb_col].to_numpy())
                 .astype(np.float64)])
        if phi == 0.0:
            break

    cands = np.unique(cands, axis=0)
    if len(cands) < k:
        raise ValueError(
            f"kmeans_init: only {len(cands)} distinct candidates for "
            f"k={k}; lower k or raise rounds/oversample")

    # weight candidates by how many points they own (one slim pass)
    def count_owner(b: pd.DataFrame, c_ref) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"cand": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        cents = ray.get(c_ref)
        idx, _ = _nearest(_emb_matrix(b, emb_col), cents)
        cnt = np.bincount(idx, minlength=len(cents))
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"cand": nz.astype(np.int64),
                             "n": cnt[nz].astype(np.int64)})

    c_ref = ray.put(cands)
    w_df = grouped_agg(
        ds.map_batches(functools.partial(count_owner, c_ref=c_ref),
                       batch_format="pandas"),
        ["cand"], {"n": ("n", "sum")}).to_pandas()
    w = np.zeros(len(cands))
    w[w_df["cand"].to_numpy(np.int64)] = w_df["n"].to_numpy(np.float64)

    # weighted k-means++ on the driver (candidates are small)
    rng = np.random.RandomState(seed)
    picked = [int(rng.choice(len(cands), p=w / w.sum()))]
    d2 = np.einsum("ij,ij->i", cands - cands[picked[0]],
                   cands - cands[picked[0]])
    for _ in range(1, k):
        p = w * d2
        if p.sum() <= 0:  # all remaining mass on existing centers
            rest = [i for i in range(len(cands)) if i not in picked]
            picked.append(int(rest[0]))
        else:
            picked.append(int(rng.choice(len(cands), p=p / p.sum())))
        nd = np.einsum("ij,ij->i", cands - cands[picked[-1]],
                       cands - cands[picked[-1]])
        d2 = np.minimum(d2, nd)
    return cands[picked].copy()


def _lloyd_partial(b: pd.DataFrame, c_ref, id_col: str,
                   emb_col: str) -> pd.DataFrame:
    empty = pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                          "dim": pd.Series([], dtype="int64"),
                          "s": pd.Series([], dtype="float64"),
                          "c": pd.Series([], dtype="int64")})
    if not len(b):
        return empty
    cents = ray.get(c_ref)
    m = _emb_matrix(b, emb_col)
    idx, d2 = _nearest(m, cents)
    k, d = cents.shape
    uniq, inv = np.unique(idx, return_inverse=True)
    sums = np.zeros((len(uniq), d))
    np.add.at(sums, inv, m)
    counts = np.bincount(inv)
    rows = pd.DataFrame({
        "cluster": np.repeat(uniq.astype(np.int64), d),
        "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
        "s": sums.ravel(),
        "c": np.repeat(counts.astype(np.int64), d)})
    inertia = pd.DataFrame({"cluster": [-1], "dim": [-1],
                            "s": [float(d2.sum())],
                            "c": [len(m)]})
    return pd.concat([rows, inertia], ignore_index=True)


def kmeans_fit(ds, k: int, *, n_iter: int = 20, tol: float = 1e-6,
               seed: int = 0, rounds: int = 5,
               oversample: float | None = None,
               init: np.ndarray | None = None,
               id_col: str = "vec_id",
               emb_col: str = "embedding") -> dict:
    """Lloyd iterations from a k-means|| seeding (or an explicit
    ``init`` matrix). Returns ``{"centroids": (k, d) ndarray,
    "inertia": [cost after each assignment pass],
    "n_iter": passes run, "shift": last max centroid movement}``.

    Each pass streams the materialized (id, embedding) projection once;
    only k x d partial sums cross the wire."""
    slim = _slim(ds, id_col, emb_col)
    cents = (np.asarray(init, dtype=np.float64) if init is not None
             else kmeans_init(slim, k, seed=seed, rounds=rounds,
                              oversample=oversample, id_col=id_col,
                              emb_col=emb_col, _materialized=True))
    if cents.shape[0] != k:
        raise ValueError(f"init has {cents.shape[0]} rows, want k={k}")
    history: list[float] = []
    shift = float("inf")
    it = 0
    for it in range(1, n_iter + 1):
        c_ref = ray.put(cents)
        agg = grouped_agg(
            slim.map_batches(
                functools.partial(_lloyd_partial, c_ref=c_ref,
                                  id_col=id_col, emb_col=emb_col),
                batch_format="pandas"),
            ["cluster", "dim"],
            {"s": ("s", "sum"), "c": ("c", "sum")}).to_pandas()
        inert = agg[agg["cluster"] == -1]
        history.append(float(inert["s"].sum()))
        body = agg[agg["cluster"] >= 0]
        new = cents.copy()  # emptied cluster keeps its centroid
        cl = body["cluster"].to_numpy(np.int64)
        dm = body["dim"].to_numpy(np.int64)
        new[cl, dm] = body["s"].to_numpy() / body["c"].to_numpy()
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        if shift < tol:
            break
    return {"centroids": cents, "inertia": history,
            "n_iter": it, "shift": shift}


def kmeans_assign(ds, centroids: np.ndarray, *,
                  id_col: str = "vec_id",
                  emb_col: str = "embedding") -> "rd.Dataset":
    """One streaming pass: ``(id, cluster, sq_dist)`` per input row
    against the broadcast centroid matrix."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64"),
                "sq_dist": pd.Series([], dtype="float64")})
        idx, d2 = _nearest(_emb_matrix(b, emb_col), ray.get(c_ref))
        return pd.DataFrame({id_col: b[id_col].to_numpy(np.int64),
                             "cluster": idx.astype(np.int64),
                             "sq_dist": d2})

    return ds.map_batches(assign, batch_format="pandas")


def kmeans_pipeline(sf_dir: str, k: int = 8, n_iter: int = 10,
                    seed: int = 0) -> pd.DataFrame:
    """Cluster the ``embeddings`` table; per-cluster summary
    ``(cluster, n, mean_sq_dist)`` sorted by cluster."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    fit = kmeans_fit(ds, k, n_iter=n_iter, seed=seed)
    out = kmeans_assign(ds, fit["centroids"])
    summary = grouped_agg(out, ["cluster"],
                          {"n": ("sq_dist", "count"),
                           "mean_sq_dist": ("sq_dist", "mean")}
                          ).to_pandas()
    summary["mean_sq_dist"] = summary["mean_sq_dist"].round(6)
    return summary.sort_values("cluster").reset_index(drop=True)
