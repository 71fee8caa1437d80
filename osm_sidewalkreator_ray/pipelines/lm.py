"""N-gram language-model quality scoring (the CCNet-style filter).

A large-scale curation pipeline scores every document against a small
reference LM and drops the worst-perplexity tail (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", LREC 2020). This module provides both halves Ray-Data-first:

- ``ngram_counts_ds`` / ``ngram_lm_train`` — distributed n-gram
  counting: each batch tokenizes its docs and emits PRE-AGGREGATED
  (gram, order, c) partials (so the shuffle carries distinct grams
  per batch, not tokens), folded by the bucketed `grouped_agg`;
  training prunes to ``min_count`` before collecting, so the model
  the driver holds is bounded by the pruned vocabulary, never the
  corpus (the reference-LM corpus is the SMALL side by design — the
  100 TB side is what gets scored, and it only streams).
- ``lm_score_ds`` — Dataset -> Dataset scoring pass: the pruned count
  tables are broadcast once via ``ray.put``; per batch every token's
  probability is resolved VECTORIZED (``pd.Series.map`` over the
  count dicts — C-level hash lookups — plus numpy where-chains for
  the backoff), no per-token Python loop.

Smoothing is stupid backoff (Brants et al., "Large Language Models in
Machine Translation", EMNLP 2007): score(w | ctx) = c(ctx w)/c(ctx)
when the n-gram was kept, else ``backoff`` * score(w | shorter ctx),
bottoming out at the unigram c(w)/N with a 1/N floor for OOV — the
smoothing designed for distributed, pruned count tables (no
normalization pass over contexts is ever needed).

Tokenization is the repo's whitespace convention (textops._tokens)
with optional lowercasing; every document is one sequence, padded
with n-1 ``<s>`` markers that are counted as context tokens but never
scored.

Relation to `textops.bigram_lm_train` / `bigram_lm_score`: that is
the fixed-order-2, top-V, eps-backoff scorer kept for its
searchsorted probe benchmark shape; this module is the general-order
(n >= 1) model with principled stupid-backoff, count pruning, BOS
context handling, perplexity output and a filter stage.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import ray

from ..functions.aggregates import grouped_agg
from .textops import _read_docs, _tokens

BOS = "<s>"
_SEP = "\x1f"


def _doc_tokens(text: str, lowercase: bool) -> list[str]:
    return _tokens(text.lower() if lowercase else text)


def _flat_padded(texts, n: int, lowercase: bool):
    """Concatenate every doc's (n-1 BOS pads + tokens) into one flat
    object array; returns (flat, padded_lengths, start_offsets)."""
    padded: list[str] = []
    plens: list[int] = []
    for text in texts:
        toks = _doc_tokens(text, lowercase)
        if not toks:
            continue
        padded.extend([BOS] * (n - 1))
        padded.extend(toks)
        plens.append(len(toks) + n - 1)
    plen = np.asarray(plens, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(plen)[:-1]]) \
        if len(plen) else np.array([], dtype=np.int64)
    return np.asarray(padded, dtype=object), plen, starts


def _gram_partial(b: pd.DataFrame, n: int, text_col: str,
                  lowercase: bool) -> pd.DataFrame:
    empty = pd.DataFrame({"gram": pd.Series([], dtype="object"),
                          "order": pd.Series([], dtype="int64"),
                          "c": pd.Series([], dtype="int64")})
    flat, plen, starts = _flat_padded(b[text_col], n, lowercase)
    if not len(flat):
        return empty
    frames = [pd.Series(flat).value_counts()
              .rename_axis("gram").reset_index(name="c")
              .assign(order=np.int64(1))]
    # order o >= 2: one gram per END position e in [s+o-1, s+p-1]
    # per doc — every o-gram's left context (o-1)-gram is counted
    # too (incl. the pure-BOS contexts of the first real token)
    for o in range(2, n + 1):
        ends = np.concatenate(
            [np.arange(s + o - 1, s + p)
             for s, p in zip(starts, plen)])
        if not len(ends):
            continue
        key = pd.Series(flat[ends - o + 1], dtype=object)
        for j in range(1, o):
            key = key.str.cat(
                pd.Series(flat[ends - o + 1 + j], dtype=object),
                sep=_SEP)
        frames.append(key.value_counts()
                      .rename_axis("gram").reset_index(name="c")
                      .assign(order=np.int64(o)))
    out = pd.concat(frames, ignore_index=True)
    return pd.DataFrame({"gram": out["gram"].astype(object),
                         "order": out["order"].astype("int64"),
                         "c": out["c"].astype("int64")})


def ngram_counts_ds(docs, n: int = 2, *, text_col: str = "text",
                    lowercase: bool = True, num_buckets: int = 32):
    """Corpus n-gram counts for every order 1..n as a streaming
    Dataset of (gram, order, c); ``gram`` joins tokens with a \\x1f
    separator. Orders >= 2 include the ``<s>`` left padding."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    parts = docs.map_batches(
        functools.partial(_gram_partial, n=n, text_col=text_col,
                          lowercase=lowercase),
        batch_format="pandas")
    return grouped_agg(parts, ["gram", "order"], {"c": ("c", "sum")},
                       num_buckets=num_buckets)


def ngram_lm_train(docs, n: int = 2, *, min_count: int = 1,
                   text_col: str = "text", lowercase: bool = True,
                   backoff: float = 0.4,
                   num_buckets: int = 32) -> dict:
    """Train a pruned stupid-backoff model. Grams below ``min_count``
    are dropped BEFORE collection (unigrams are always kept so the
    base distribution stays dense); ``total`` is the unpruned token
    mass (incl. <s>), so pruning never changes unigram scores."""
    counts = ngram_counts_ds(docs, n, text_col=text_col,
                             lowercase=lowercase,
                             num_buckets=num_buckets)
    kept = counts.map_batches(
        lambda b: b.loc[(b["order"] == 1) | (b["c"] >= min_count)],
        batch_format="pandas").to_pandas()
    if not len(kept):
        raise ValueError("ngram_lm_train: empty corpus")
    tables: list[dict] = []
    for o in range(1, n + 1):
        sub = kept.loc[kept["order"] == o]
        tables.append(dict(zip(sub["gram"], sub["c"].astype(int))))
    total = int(sum(c for g, c in tables[0].items()))
    return {"n": n, "tables": tables, "total": total,
            "backoff": float(backoff), "lowercase": lowercase,
            "min_count": int(min_count)}


def _score_batch(b: pd.DataFrame, m_ref, text_col: str,
                 id_cols: list[str]) -> pd.DataFrame:
    model = ray.get(m_ref)
    n, tables, total, bo = (model["n"], model["tables"],
                            model["total"], model["backoff"])
    docs = [_doc_tokens(t, model["lowercase"]) for t in b[text_col]]
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    out = b[id_cols].copy() if id_cols else pd.DataFrame(index=b.index)
    out["n_tokens"] = lens
    if lens.sum() == 0:
        out["logprob"] = 0.0
        out["ppl"] = np.where(lens == 0, np.nan, np.nan)
        return out
    # flat token stream with n-1 BOS pads per doc; scored positions
    # are the real tokens only
    padded = []
    for d in docs:
        padded.extend([BOS] * (n - 1))
        padded.extend(d)
    flat = np.asarray(padded, dtype=object)
    plen = lens + (n - 1)
    starts = np.concatenate([[0], np.cumsum(plen)[:-1]])
    pos = np.concatenate(
        [np.arange(s + n - 1, s + p)
         for s, p in zip(starts, plen)]) if len(lens) else \
        np.array([], dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(lens)), lens)

    # resolve probabilities highest order first, numpy backoff chain
    w = pd.Series(flat[pos], dtype=object)
    c_w = w.map(tables[0]).to_numpy(dtype=np.float64, na_value=0.0)
    prob = np.where(c_w > 0, c_w / total, 1.0 / total)  # unigram base
    mult = np.full(len(pos), bo ** (n - 1), dtype=np.float64)
    ctx = None  # joined previous (o-1) tokens, grown incrementally
    for o in range(2, n + 1):
        prev = pd.Series(flat[pos - (o - 1)], dtype=object)
        ctx = prev if o == 2 else prev.str.cat(ctx, sep=_SEP)
        key = ctx.str.cat(w, sep=_SEP)
        c_full = key.map(tables[o - 1]) \
            .to_numpy(dtype=np.float64, na_value=0.0)
        c_ctx = ctx.map(tables[o - 2]) \
            .to_numpy(dtype=np.float64, na_value=0.0)
        hit = (c_full > 0) & (c_ctx > 0)
        prob = np.where(hit, np.divide(
            c_full, c_ctx, out=np.zeros_like(c_full),
            where=c_ctx > 0), prob)
        mult = np.where(hit, bo ** (n - o), mult)
    lp = np.log(prob * mult)
    doc_lp = np.zeros(len(lens), dtype=np.float64)
    np.add.at(doc_lp, doc_idx, lp)
    out["logprob"] = doc_lp
    with np.errstate(divide="ignore", invalid="ignore"):
        out["ppl"] = np.where(lens > 0, np.exp(-doc_lp / lens), np.nan)
    return out


def lm_score_ds(docs, model: dict, *, text_col: str = "text",
                id_cols: list[str] | None = None):
    """Score every document: adds (n_tokens, logprob, ppl). The
    pruned model crosses the wire once (ray.put)."""
    m_ref = ray.put(model)
    return docs.map_batches(
        functools.partial(_score_batch, m_ref=m_ref,
                          text_col=text_col,
                          id_cols=id_cols
                          if id_cols is not None else ["doc_id"]),
        batch_format="pandas")


def lm_ppl_filter_ds(docs, model: dict, max_ppl: float, *,
                     text_col: str = "text",
                     id_cols: list[str] | None = None):
    """Keep documents with perplexity <= max_ppl (empty docs drop) —
    the CCNet head/middle cut as one streaming stage."""
    scored = lm_score_ds(docs, model, text_col=text_col,
                         id_cols=id_cols)
    return scored.map_batches(
        lambda b: b.loc[b["ppl"].notna() & (b["ppl"] <= max_ppl)],
        batch_format="pandas")


def lm_quality(sf_dir: str, n: int = 2, min_count: int = 2):
    """Train on the documents table and score it — the small-SF
    driver surface. Returns (doc_id, n_tokens, logprob, ppl) sorted
    by doc_id."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    model = ngram_lm_train(docs, n=n, min_count=min_count)
    out = lm_score_ds(docs, model).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["logprob"] = out["logprob"].round(9)
    out["ppl"] = out["ppl"].round(9)
    return out.sort_values("doc_id").reset_index(drop=True)
