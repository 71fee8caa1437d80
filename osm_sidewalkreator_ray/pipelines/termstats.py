"""Corpus term statistics: TF-IDF document VECTORS and windowed PMI
word associations — the feature-extraction ops a text-curation
pipeline feeds into clustering/ANN (this repo's kmeans/PCA/IVF stages
consume the output column directly).

Relation to the textops siblings (different outputs, same corpus
stats): `textops.tfidf_topk` extracts top-k KEYWORD ROWS per doc
(open vocabulary, hash-join plan); `tfidf_vectors_ds` here produces
the dense FEATURE COLUMN over a bounded top-df vocabulary.
`textops.pmi_collocations` scores ADJACENT pairs with open-vocab
count joins; `pmi_pairs` here generalizes to a +-window and uses a
vocab-bounded broadcast for the unigram attach (valid because pairs
are pre-restricted to the top vocabulary).

TF-IDF (Sparck Jones 1972; the smoothed variant popularized by
scikit-learn): two streaming passes.
  pass 1  document frequencies — each batch emits its docs' DISTINCT
          terms pre-counted, the bucketed `grouped_agg` folds them;
          only the top-``vocab_size`` terms (by df, ties broken by
          term for determinism) are collected and broadcast, so
          driver state is O(vocab), never O(corpus terms).
  pass 2  each batch vectorizes its docs against the broadcast vocab
          (Series.map -> column index, np.add.at scatter) and scales
          by idf = ln((1+N)/(1+df)) + 1, optional L2 norm — one
          (rows, vocab) dense block per batch, no Python loop over
          tokens.

PMI (Church & Hanks 1990): co-occurrence pairs within a +-window
are generated per batch by flat-array shifts (offset 1..window, pair
canonicalized so (a,b)==(b,a)), pre-counted, folded by `grouped_agg`;
the PMI score ln(c_ab * T / (c_a * c_b)) is attached by mapping the
folded pairs against the broadcast unigram counts of the SAME top
vocabulary, so the pair shuffle only ever carries vocab x vocab
candidates actually observed.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import ray

from ..functions.aggregates import grouped_agg
from .lm import _flat_padded
from .textops import _read_docs, _tokens


def _doc_terms(text: str, lowercase: bool) -> list[str]:
    return _tokens(text.lower() if lowercase else text)


# ------------------------------------------------------------- tf-idf

def _df_partial(b: pd.DataFrame, text_col: str,
                lowercase: bool) -> pd.DataFrame:
    terms: dict[str, int] = {}
    n_docs = 0
    for text in b[text_col]:
        toks = _doc_terms(text, lowercase)
        if not toks:
            continue
        n_docs += 1
        for t in set(toks):
            terms[t] = terms.get(t, 0) + 1
    out = pd.DataFrame({"term": pd.Series(list(terms), dtype="object"),
                        "df": pd.Series(list(terms.values()),
                                        dtype="int64")})
    out["n_docs"] = np.int64(n_docs)
    # marker row carries the batch's doc count into the same fold
    marker = pd.DataFrame({"term": ["\x00docs"],
                           "df": [np.int64(n_docs)],
                           "n_docs": [np.int64(n_docs)]})
    return pd.concat([out[["term", "df"]], marker[["term", "df"]]],
                     ignore_index=True)


def document_frequencies(docs, *, text_col: str = "text",
                         lowercase: bool = True,
                         num_buckets: int = 32):
    """(term, df) Dataset plus the corpus doc count smuggled as the
    reserved term ``\\x00docs`` (callers below strip it)."""
    parts = docs.map_batches(
        functools.partial(_df_partial, text_col=text_col,
                          lowercase=lowercase),
        batch_format="pandas")
    return grouped_agg(parts, ["term"], {"df": ("df", "sum")},
                       num_buckets=num_buckets)


def build_vocab(docs, vocab_size: int = 4096, *,
                text_col: str = "text", lowercase: bool = True,
                min_df: int = 1, num_buckets: int = 32) -> dict:
    """Top-``vocab_size`` terms by document frequency (ties -> term
    asc, deterministic). Returns {"terms": [..], "df": (V,), "n_docs":
    N} — O(vocab) driver state: the folded df table holds DISTINCT
    terms per block, so a per-block top-k is exact after the fold and
    only blocks x k rows ever reach the driver (never the full
    term table)."""
    folded = document_frequencies(
        docs, text_col=text_col, lowercase=lowercase,
        num_buckets=num_buckets).materialize()
    k = int(vocab_size)

    def block_top(b: pd.DataFrame, _k=k, _m=min_df) -> pd.DataFrame:
        body = b.loc[(b["term"] != "\x00docs") & (b["df"] >= _m)]
        n = int(b.loc[b["term"] == "\x00docs", "df"].sum())
        top = body.sort_values(["df", "term"],
                               ascending=[False, True]).head(_k)
        out = pd.DataFrame({"term": top["term"].astype(object),
                            "df": top["df"].astype("int64")})
        # marker row survives even when the block has no top terms
        return pd.concat([out, pd.DataFrame(
            {"term": ["\x00docs"], "df": [np.int64(n)]})],
            ignore_index=True)

    tops = folded.map_batches(block_top,
                              batch_format="pandas").to_pandas()
    n_docs = int(tops.loc[tops["term"] == "\x00docs", "df"].sum())
    top = tops.loc[tops["term"] != "\x00docs"] \
        .sort_values(["df", "term"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    return {"terms": top["term"].tolist(),
            "df": top["df"].to_numpy(np.int64),
            "n_docs": n_docs,
            "lowercase": lowercase}


def _tfidf_batch(b: pd.DataFrame, v_ref, text_col: str,
                 out_col: str, norm: bool,
                 id_cols: list[str]) -> pd.DataFrame:
    vocab = ray.get(v_ref)
    index: dict = vocab["index"]
    idf: np.ndarray = vocab["idf"]
    lowercase = vocab["lowercase"]
    out = b[id_cols].copy()
    docs = [_doc_terms(t, lowercase) for t in b[text_col]]
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    flat = pd.Series(np.concatenate(
        [np.asarray(d, dtype=object) for d in docs])
        if lens.sum() else np.array([], dtype=object), dtype=object)
    col = flat.map(index).to_numpy(dtype=np.float64, na_value=-1.0) \
        .astype(np.int64)
    row = np.repeat(np.arange(len(docs)), lens)
    keep = col >= 0
    mat = np.zeros((len(docs), len(idf)))
    np.add.at(mat, (row[keep], col[keep]), 1.0)
    mat *= idf[None, :]
    if norm:
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = np.divide(mat, nrm, out=np.zeros_like(mat),
                        where=nrm > 0)
    out[out_col] = list(mat)
    return out


def tfidf_vectors_ds(docs, vocab: dict, *, text_col: str = "text",
                     out_col: str = "tfidf", norm: bool = True,
                     id_cols: list[str] | None = None):
    """Dense TF-IDF vectors over the broadcast vocabulary — a
    Dataset -> Dataset map; each row's vector is a list<float64> of
    length len(vocab["terms"]) (embedding-column convention, so the
    output feeds kmeans/pca/knn directly)."""
    idf = np.log((1.0 + vocab["n_docs"])
                 / (1.0 + vocab["df"].astype(np.float64))) + 1.0
    v_ref = ray.put({"index": {t: i for i, t
                               in enumerate(vocab["terms"])},
                     "idf": idf, "lowercase": vocab["lowercase"]})
    return docs.map_batches(
        functools.partial(_tfidf_batch, v_ref=v_ref,
                          text_col=text_col, out_col=out_col,
                          norm=norm,
                          id_cols=id_cols if id_cols is not None
                          else ["doc_id"]),
        batch_format="pandas")


def tfidf_pipeline(sf_dir: str, vocab_size: int = 64,
                   norm: bool = True) -> pd.DataFrame:
    """Vocab + vectors over the documents table; (doc_id, tfidf)
    sorted by doc_id — the small-SF driver surface."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    vocab = build_vocab(docs, vocab_size)
    out = tfidf_vectors_ds(docs, vocab, norm=norm).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------- pmi

def _pair_partial(b: pd.DataFrame, window: int, text_col: str,
                  lowercase: bool, vocab_ref=None) -> pd.DataFrame:
    empty = pd.DataFrame({"a": pd.Series([], dtype="object"),
                          "b": pd.Series([], dtype="object"),
                          "c": pd.Series([], dtype="int64")})
    flat, plen, starts = _flat_padded(b[text_col], 1, lowercase)
    if not len(flat):
        return empty
    # vocab prefilter: pairs are restricted to vocab x vocab anyway
    # (attach drops the rest), so drop out-of-vocab PAIRS here —
    # after windowing, so token distances are unchanged — instead of
    # shuffling the open-vocabulary pair table (heavy-tailed corpora
    # make that orders of magnitude larger than the bounded result)
    voc = ray.get(vocab_ref) if vocab_ref is not None else None
    frames = []
    for off in range(1, window + 1):
        ends = np.concatenate(
            [np.arange(s + off, s + p)
             for s, p in zip(starts, plen)])
        if not len(ends):
            continue
        x = flat[ends - off]
        y = flat[ends]
        if voc is not None:
            m = (pd.Series(x).isin(voc)
                 & pd.Series(y).isin(voc)).to_numpy()
            if not m.any():
                continue
            x, y = x[m], y[m]
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        frames.append(pd.DataFrame({"a": lo, "b": hi}))
    if not frames:
        return empty
    pairs = pd.concat(frames, ignore_index=True)
    vc = pairs.value_counts(sort=False).reset_index(name="c")
    vc["c"] = vc["c"].astype("int64")
    return vc


def pmi_pairs(docs, *, window: int = 2, min_count: int = 2,
              vocab_size: int = 4096, text_col: str = "text",
              lowercase: bool = True,
              num_buckets: int = 32) -> pd.DataFrame:
    """Pointwise mutual information of co-occurring word pairs
    within a +-``window`` token distance (pairs unordered, both
    words restricted to the top vocabulary). Returns (a, b, c_pair,
    c_a, c_b, pmi) sorted by pmi desc, pair asc — small by
    construction: observed pairs over a bounded vocab."""
    vocab = build_vocab(docs, vocab_size, text_col=text_col,
                        lowercase=lowercase, num_buckets=num_buckets)
    vocab_ref = ray.put(set(vocab["terms"]))
    parts = docs.map_batches(
        functools.partial(_pair_partial, window=window,
                          text_col=text_col, lowercase=lowercase,
                          vocab_ref=vocab_ref),
        batch_format="pandas")
    folded = grouped_agg(parts, ["a", "b"], {"c": ("c", "sum")},
                         num_buckets=num_buckets)

    # unigram occurrence counts + total token mass, one more fold
    def uni_partial(bb: pd.DataFrame) -> pd.DataFrame:
        flat, _, _ = _flat_padded(bb[text_col], 1, lowercase)
        if not len(flat):
            return pd.DataFrame({"term": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="int64")})
        vc = pd.Series(flat).value_counts()
        return vc.rename_axis("term").reset_index(name="c")

    uni_folded = grouped_agg(
        docs.map_batches(uni_partial, batch_format="pandas"),
        ["term"], {"c": ("c", "sum")},
        num_buckets=num_buckets).materialize()
    # total token mass: distributed scalar; the driver only ever
    # collects the VOCAB-restricted unigram rows (bounded), never
    # the full term table
    total = float(uni_folded.sum("c"))
    in_vocab = set(vocab["terms"])
    uni = uni_folded.map_batches(
        lambda b, _v=in_vocab: b.loc[b["term"].isin(_v)],
        batch_format="pandas").to_pandas()
    cnt = dict(zip(uni["term"], uni["c"].astype(float)))
    c_ref = ray.put((cnt, in_vocab))

    def attach(bb: pd.DataFrame) -> pd.DataFrame:
        counts, voc = ray.get(c_ref)
        keep = (bb["c"] >= min_count) & bb["a"].isin(voc) \
            & bb["b"].isin(voc)
        bb = bb.loc[keep].copy()
        ca = bb["a"].map(counts).to_numpy(np.float64)
        cb = bb["b"].map(counts).to_numpy(np.float64)
        cc = bb["c"].to_numpy(np.float64)
        return pd.DataFrame({
            "a": bb["a"], "b": bb["b"],
            "c_pair": bb["c"].astype("int64"),
            "c_a": ca.astype(np.int64), "c_b": cb.astype(np.int64),
            "pmi": np.log(cc * total / (ca * cb))})

    out = folded.map_batches(attach, batch_format="pandas") \
        .to_pandas()
    return out.sort_values(["pmi", "a", "b"],
                           ascending=[False, True, True]) \
        .reset_index(drop=True)


# ----------------------------------------------------- hashing trick

def _hashed_batch(b: pd.DataFrame, dim: int, text_col: str,
                  out_col: str, lowercase: bool, norm: bool,
                  signed: bool, id_cols: list[str]) -> pd.DataFrame:
    out = b[id_cols].copy()
    docs = [_doc_terms(t, lowercase) for t in b[text_col]]
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    mat = np.zeros((len(docs), dim))
    if lens.sum():
        flat = np.concatenate(
            [np.asarray(d, dtype=object) for d in docs])
        h = pd.util.hash_array(flat)
        col = (h % np.uint64(dim)).astype(np.int64)
        row = np.repeat(np.arange(len(docs)), lens)
        # Weinberger sign bit kills the E[collision] bias
        val = (np.where((h >> np.uint64(63)).astype(bool), 1.0, -1.0)
               if signed else np.ones(len(flat)))
        np.add.at(mat, (row, col), val)
    if norm:
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = np.divide(mat, nrm, out=np.zeros_like(mat),
                        where=nrm > 0)
    out[out_col] = list(mat)
    return out


def hashed_vectors_ds(docs, dim: int = 1024, *,
                      text_col: str = "text", out_col: str = "hv",
                      lowercase: bool = True, norm: bool = True,
                      signed: bool = True,
                      id_cols: list[str] | None = None):
    """Feature-hashing ("hashing trick") document vectors
    (Weinberger et al., ICML 2009): term -> hash % dim with a signed
    +-1 bucket update, NO vocabulary pass, NO broadcast state at all
    — the open-vocabulary, fully shuffle-free complement of
    `tfidf_vectors_ds` for corpora whose vocab can't be bounded.
    One scatter-add per batch."""
    return docs.map_batches(
        functools.partial(_hashed_batch, dim=int(dim),
                          text_col=text_col, out_col=out_col,
                          lowercase=lowercase, norm=norm,
                          signed=signed,
                          id_cols=id_cols if id_cols is not None
                          else ["doc_id"]),
        batch_format="pandas")
