"""Distributed PCA over an embedding column.

``pca_fit`` is ONE streaming pass: each batch emits its moment
partials — row count, column sum (d,) and the Gram matrix X^T X
(d x d) packed flat — O(d^2) floats per batch REGARDLESS of rows, so
nothing cardinality-proportional ever leaves a task. The driver folds
the partials (exact: float64 sums commute up to rounding), forms the
covariance ``(G - n mu mu^T) / (n - 1)`` and eigendecomposes the tiny
(d x d) matrix locally — d is the embedding width (64 in the test
tables), never the corpus size. Eigenvectors are sign-canonicalized
(largest-|.| coordinate made positive) so results are deterministic
and partitioning-invariant.

``pca_transform`` broadcasts the (k, d) component matrix once via
``ray.put``; each batch is a single centered matmul. ``whiten=True``
additionally scales scores by 1/sqrt(eigenvalue) (unit variance per
component).

``reconstruction_mse`` streams a second pass folding per-batch
squared-error sums — the standard "how much did k components keep"
diagnostic, again O(1) rows per batch.

This is classical PCA (Pearson 1901 / Hotelling 1933) in the
two-moment streaming formulation; for d too large to hold d^2 floats
per task the randomized-sketch route (Halko, Martinsson, Tropp, SIAM
Rev. 2011) is the follow-on, not needed at embedding widths.

Relation to `vectors.embedding_covariance` / `embedding_top_component`:
those expose the raw covariance aggregate and a single power-iteration
component (the OPQ/whitening prep primitives); this module is the full
fitted-model surface — all k components, explained variance, a
broadcast transform stage, whitening, and reconstruction diagnostics.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _emb_matrix(batch: pd.DataFrame, emb_col: str) -> np.ndarray:
    return np.stack(batch[emb_col].to_numpy()).astype(np.float64)


def _moment_partial(b: pd.DataFrame, emb_col: str) -> pd.DataFrame:
    if not len(b):
        return pd.DataFrame({"n": pd.Series([], dtype="int64"),
                             "s": pd.Series([], dtype="object"),
                             "g": pd.Series([], dtype="object")})
    m = _emb_matrix(b, emb_col)
    return pd.DataFrame({
        "n": [np.int64(len(m))],
        "s": [m.sum(axis=0)],
        "g": [(m.T @ m).ravel()]})


def _canon_signs(w: np.ndarray) -> np.ndarray:
    """Flip each row so its largest-magnitude coordinate is positive
    — fixes the eigenvector sign ambiguity deterministically."""
    j = np.argmax(np.abs(w), axis=1)
    flip = np.sign(w[np.arange(len(w)), j])
    flip[flip == 0] = 1.0
    return w * flip[:, None]


def pca_fit(ds, k: int | None = None, *, emb_col: str = "embedding",
            center: bool = True) -> dict:
    """Fit PCA on ``ds[emb_col]`` (list<float> column). Returns
    ``{"mean": (d,), "components": (k, d), "explained_variance":
    (k,), "explained_variance_ratio": (k,), "n": rows}`` with
    components ordered by descending eigenvalue.

    ``center=False`` skips mean removal (eigenvectors of the raw
    second-moment matrix — the form used on already-centered or
    TF-IDF-style nonnegative data)."""
    parts = (ds.map_batches(
        functools.partial(_moment_partial, emb_col=emb_col),
        batch_format="pandas").take_all())
    if not parts:
        raise ValueError("pca_fit: empty dataset")
    n = int(sum(p["n"] for p in parts))
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    d = s.shape[0]
    gram = g.reshape(d, d)
    if center:
        if n < 2:
            raise ValueError("pca_fit: need >= 2 rows to center")
        mean = s / n
        cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    else:
        mean = np.zeros(d)
        cov = gram / max(n - 1, 1)
    # eigh returns ascending; flip to descending
    evals, evecs = np.linalg.eigh(cov)
    evals = np.maximum(evals[::-1], 0.0)
    comps = _canon_signs(evecs[:, ::-1].T)
    k = d if k is None else int(k)
    if not 1 <= k <= d:
        raise ValueError(f"pca_fit: k={k} outside [1, {d}]")
    total = float(evals.sum())
    return {"mean": mean,
            "components": comps[:k],
            "explained_variance": evals[:k],
            "explained_variance_ratio":
                evals[:k] / total if total > 0 else evals[:k],
            "n": n}


def _project(b: pd.DataFrame, m_ref, emb_col: str, out_col: str,
             whiten: bool, drop_input: bool) -> pd.DataFrame:
    out = b.drop(columns=[emb_col]) if drop_input else b.copy()
    if not len(b):
        out[out_col] = pd.Series([], dtype="object")
        return out
    mean, comps, scale = ray.get(m_ref)
    p = (_emb_matrix(b, emb_col) - mean) @ comps.T
    if whiten:
        p = p * scale
    out[out_col] = list(p)
    return out


def pca_transform(ds, model: dict, *, emb_col: str = "embedding",
                  out_col: str = "pc", whiten: bool = False,
                  drop_input: bool = True):
    """Project every row onto the fitted components — a Dataset ->
    Dataset map; the (k, d) model crosses the wire once."""
    ev = model["explained_variance"]
    scale = 1.0 / np.sqrt(np.maximum(ev, 1e-300))
    m_ref = ray.put((model["mean"], model["components"], scale))
    return ds.map_batches(
        functools.partial(_project, m_ref=m_ref, emb_col=emb_col,
                          out_col=out_col, whiten=whiten,
                          drop_input=drop_input),
        batch_format="pandas")


def _recon_partial(b: pd.DataFrame, m_ref,
                   emb_col: str) -> pd.DataFrame:
    if not len(b):
        return pd.DataFrame({"sse": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    mean, comps, _ = ray.get(m_ref)
    x = _emb_matrix(b, emb_col) - mean
    r = x - (x @ comps.T) @ comps
    return pd.DataFrame({"sse": [float((r * r).sum())],
                         "n": [np.int64(len(x))]})


def reconstruction_mse(ds, model: dict, *,
                       emb_col: str = "embedding") -> float:
    """Mean squared reconstruction error of the rank-k model — one
    streaming pass, O(1) rows per batch."""
    m_ref = ray.put((model["mean"], model["components"], None))
    agg = (ds.map_batches(
        functools.partial(_recon_partial, m_ref=m_ref,
                          emb_col=emb_col),
        batch_format="pandas")
        .sum(["sse", "n"]))
    return float(agg["sum(sse)"]) / max(int(agg["sum(n)"]), 1)


def _rp_matrix(d: int, k: int, seed: int) -> np.ndarray:
    """Deterministic Gaussian JL matrix, scaled 1/sqrt(k) — built
    once per call site and broadcast, never per batch."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((k, d)) / np.sqrt(k)


def _rp_batch(b: pd.DataFrame, m_ref, emb_col: str, out_col: str,
              drop_input: bool) -> pd.DataFrame:
    out = b.drop(columns=[emb_col]) if drop_input else b.copy()
    if not len(b):
        out[out_col] = pd.Series([], dtype="object")
        return out
    r = ray.get(m_ref)
    out[out_col] = list(_emb_matrix(b, emb_col) @ r.T)
    return out


def random_projection_ds(ds, k: int, *, seed: int = 0,
                         emb_col: str = "embedding",
                         out_col: str = "rp",
                         drop_input: bool = True):
    """Johnson-Lindenstrauss Gaussian random projection to k dims —
    the data-independent complement of PCA (no fit pass at all; a
    JL map preserves pairwise distances within 1+-eps for
    k = O(log n / eps^2), Johnson & Lindenstrauss 1984). The (k, d)
    matrix is derived from the seed, ray.put once, and applied as
    one matmul per batch."""
    d = len(ds.limit(1).to_pandas()[emb_col].iloc[0])
    m_ref = ray.put(_rp_matrix(d, int(k), seed))
    return ds.map_batches(
        functools.partial(_rp_batch, m_ref=m_ref, emb_col=emb_col,
                          out_col=out_col, drop_input=drop_input),
        batch_format="pandas")


def pca_pipeline(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """Fit + project the embeddings table; returns (vec_id, pc)
    sorted by vec_id — the small-SF query/benchmark surface."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    model = pca_fit(ds, k)
    out = pca_transform(ds, model).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)
