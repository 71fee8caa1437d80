"""Vector/similarity operators over the ``embeddings`` table.

- brute-force cosine top-k against a broadcast query matrix (numpy
  matmul per batch, partial top-k per batch, tiny driver-side merge)
- kNN self-join for a sample of query vectors
- LSH-bucketed near-duplicate detection (random hyperplane signatures)
  as the scale path: candidates only within a bucket, never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _read_emb(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def _batch_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).astype(np.float64)


def embedding_norms(sf_dir: str):
    """vec_id -> L2 norm (vectorized per batch)."""
    ds = _read_emb(sf_dir, ["vec_id", "embedding"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        m = _batch_matrix(batch)
        return pd.DataFrame({"vec_id": batch["vec_id"],
                             "l2_norm": np.linalg.norm(m, axis=1).round(6)})

    out = ds.map_batches(f, batch_format="pandas")
    return out.to_pandas().sort_values("vec_id").reset_index(drop=True)


NORMS_SQL = """
SELECT vec_id,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
         AS l2_norm
FROM embeddings ORDER BY vec_id
"""


class _CosineTopK:
    """Actor-pool stage: the query matrix is fetched once per actor."""

    def __init__(self, q_ref, k: int):
        q = ray.get(q_ref)  # (nq, d) float64, rows unit-normalized
        self.q = q
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _batch_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ self.q.T  # (batch, nq)
        out = {"query_id": [], "vec_id": [], "cosine_sim": []}
        ids = batch["vec_id"].to_numpy()
        k = min(self.k, len(ids))
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k]
            out["query_id"].extend([qi] * k)
            out["vec_id"].extend(ids[top])
            out["cosine_sim"].extend(s[top])
        return pd.DataFrame(out)


def ann_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k vs the vec_id=0 embedding: per-batch
    partial top-k, merged on the driver (only k rows per batch move)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)[None, :]
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put(q)
    ds = _read_emb(sf_dir, ["vec_id", "embedding"])
    partial = ds.map_batches(_CosineTopK, fn_constructor_args=(q_ref, k),
                             batch_format="pandas", batch_size=4096,
                             concurrency=(1, 2))
    df = partial.to_pandas()
    df["cosine_sim"] = df["cosine_sim"].astype(float)
    df = df.sort_values(["cosine_sim", "vec_id"],
                        ascending=[False, True]).head(k)
    df["cosine_sim"] = df["cosine_sim"].round(6)
    return df[["vec_id", "cosine_sim"]].reset_index(drop=True)


ANN_TOPK_SQL = """
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
         AS cosine_sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
         e.vec_id
LIMIT 10
"""


def knn_join_sample(sf_dir: str, n_queries: int = 5, k: int = 3):
    """For vec_id 0..n_queries-1: top-k nearest (excluding self)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_queries)])
    order = np.argsort(t["vec_id"].to_numpy())
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])[order]
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put(q)
    ds = _read_emb(sf_dir, ["vec_id", "embedding"])
    partial = ds.map_batches(_CosineTopK, fn_constructor_args=(q_ref, k + 1),
                             batch_format="pandas", batch_size=4096,
                             concurrency=(1, 2))
    df = partial.to_pandas()
    df = df[df["query_id"] != df["vec_id"]]
    df = (df.sort_values(["query_id", "cosine_sim", "vec_id"],
                         ascending=[True, False, True])
            .groupby("query_id").head(k))
    df["cosine_sim"] = df["cosine_sim"].astype(float).round(6)
    return df[["query_id", "vec_id", "cosine_sim"]].reset_index(drop=True)


KNN_SQL = """
SELECT q.vec_id AS query_id, e.vec_id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
         AS cosine_sim
FROM embeddings e, embeddings q
WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
QUALIFY row_number() OVER (
  PARTITION BY q.vec_id
  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
           e.vec_id) <= 3
ORDER BY query_id, cosine_sim DESC, e.vec_id
"""


def ivf_topk(sf_dir: str, k: int = 10, n_clusters: int = 16,
             n_probe: int = 4, seed: int = 42):
    """IVF-style ANN (the scale path next to brute force): deterministic
    mini-kmeans centroids (fixed 5 Lloyd iterations over a driver-side
    sample), vectors bucketed by nearest centroid via map_batches, and
    the query probes only ``n_probe`` inverted lists. Rows-only check
    (approximate by construction); recall vs the exact oracle is
    asserted in tests."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in t["embedding"].to_pylist()[:2048]])
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), n_clusters, replace=False)]
    for _ in range(5):
        lab = (sample @ cent.T).argmax(axis=1)
        for c in range(n_clusters):
            sel = sample[lab == c]
            if len(sel):
                v = sel.mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    q = q / np.linalg.norm(q)
    probes = np.argsort(-(cent @ q))[:n_probe]
    cent_ref = ray.put(cent)
    probe_ref = ray.put(np.asarray(probes))
    q_ref = ray.put(q[None, :])

    def bucket_and_score(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        pr = ray.get(probe_ref)
        qv = ray.get(q_ref)
        m = _batch_matrix(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        lab = (m @ c.T).argmax(axis=1)
        keep = np.isin(lab, pr)
        sims = (m[keep] @ qv.T)[:, 0]
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy()[keep],
                             "cosine_sim": sims})

    ds = _read_emb(sf_dir, ["vec_id", "embedding"])
    df = ds.map_batches(bucket_and_score, batch_format="pandas").to_pandas()
    df = df.sort_values(["cosine_sim", "vec_id"],
                        ascending=[False, True]).head(k)
    df["cosine_sim"] = df["cosine_sim"].round(6)
    return df.reset_index(drop=True)


def embedding_near_dups(sf_dir: str, sim_threshold: float = 0.95,
                        n_planes: int = 12, seed: int = 42):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets:
    signature per batch -> groupby(signature) -> within-bucket pairwise
    cosine (rows-only check; candidates never cross buckets)."""
    ds = _read_emb(sf_dir, ["vec_id", "embedding"])

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        m = _batch_matrix(batch)
        d = m.shape[1]
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((n_planes, d))
        bits = (m @ planes.T) > 0
        sig = bits @ (1 << np.arange(n_planes))
        return pd.DataFrame({"vec_id": batch["vec_id"],
                             "bucket": sig.astype(np.int64),
                             "embedding": batch["embedding"]})

    bucketed = ds.map_batches(sig, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64"),
                                 "cosine_sim": pd.Series([], dtype="float64")})
        g = g.sort_values("vec_id")
        m = _batch_matrix(g)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ids = g["vec_id"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= sim_threshold
        return pd.DataFrame({"vec_a": ids[ii[keep]], "vec_b": ids[jj[keep]],
                             "cosine_sim": sims[ii[keep], jj[keep]].round(6)})

    out = bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                             "vec_b": pd.Series([], dtype="int64"),
                             "cosine_sim": pd.Series([], dtype="float64")})
    df = df.drop_duplicates(["vec_a", "vec_b"])
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
