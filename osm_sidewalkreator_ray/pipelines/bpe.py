"""BPE tokenizer training + encoding over the ``documents`` table.

Classic byte-pair-encoding (Sennrich et al. 2016) trained the way it
actually scales: ONE corpus pass builds the word-TYPE frequency table
(vocabulary-bounded — at 100 TB the type table is ~10^7 rows while the
corpus is ~10^11 words), then every merge iteration runs over the slim
type table only:

  map_batches: per-type adjacent-pair counts weighted by word count
  -> grouped_agg (bucketed partial sum of (pair, n) rows)
  -> driver argmax (count DESC, pair ASC tie-break — deterministic)
  -> broadcast the winning pair, map_batches applies the merge.

Driver state per iteration is the top-1 row; the type table streams.
Encoding broadcasts the merge ranks once and encodes each doc's words
greedily (lowest-rank pair first), with a per-worker word->pieces
memo so repeated words cost one lookup.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.aggregates import grouped_agg
from .textops import _read_docs, _tokens

_EOW = "▁"  # end-of-word marker (SentencePiece-style block)


def word_type_table(docs):
    """One corpus pass -> Dataset of (word, n) type frequencies."""
    def part(batch: pd.DataFrame) -> pd.DataFrame:
        cnt = Counter()
        for text in batch["text"]:
            cnt.update(_tokens(text))
        return pd.DataFrame({"word": list(cnt.keys()),
                             "n": pd.Series(list(cnt.values()),
                                            dtype="int64")})
    return grouped_agg(docs.map_batches(part, batch_format="pandas"),
                       ["word"], {"n": ("n", "sum")})


def _sym_init(word: str) -> list[str]:
    return list(word) + [_EOW]


def _pair_counts(batch: pd.DataFrame) -> pd.DataFrame:
    cnt: Counter = Counter()
    for syms, n in zip(batch["syms"], batch["n"]):
        for a, b in zip(syms, syms[1:]):
            cnt[(a, b)] += int(n)
    if not cnt:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "c": pd.Series([], dtype="int64")})
    ks = list(cnt.keys())
    return pd.DataFrame({"a": [k[0] for k in ks],
                         "b": [k[1] for k in ks],
                         "c": pd.Series(list(cnt.values()),
                                        dtype="int64")})


def _apply_merge(syms: list, pair: tuple[str, str]) -> list:
    a, b = pair
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(docs, n_merges: int = 20) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges; returns the ordered merge list.
    Deterministic: ties break on (count DESC, a ASC, b ASC)."""
    types = word_type_table(docs).map_batches(
        lambda b: pd.DataFrame({"syms": b["word"].map(_sym_init),
                                "n": b["n"].astype("int64")}),
        batch_format="pandas").materialize()  # type table, not corpus

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = grouped_agg(
            types.map_batches(_pair_counts, batch_format="pandas"),
            ["a", "b"], {"c": ("c", "sum")})

        def top1(b: pd.DataFrame) -> pd.DataFrame:
            if b.empty or "c" not in b.columns:
                return pd.DataFrame({"a": pd.Series([], dtype=object),
                                     "b": pd.Series([], dtype=object),
                                     "c": pd.Series([], dtype="int64")})
            return b.sort_values(["c", "a", "b"],
                                 ascending=[False, True, True]).head(1)

        best = (pairs.map_batches(top1, batch_format="pandas")
                .to_pandas()
                .sort_values(["c", "a", "b"],
                             ascending=[False, True, True]).head(1))
        if best.empty or int(best["c"].iloc[0]) < 2:
            break
        pair = (str(best["a"].iloc[0]), str(best["b"].iloc[0]))
        merges.append(pair)
        pref = ray.put(pair)

        def apply(b: pd.DataFrame) -> pd.DataFrame:
            p = ray.get(pref)
            return pd.DataFrame({"syms": b["syms"].map(
                lambda s: _apply_merge(list(s), p)),
                "n": b["n"].astype("int64")})

        types = types.map_batches(apply,
                                  batch_format="pandas").materialize()
    return merges


_RANK_CACHE: dict = {}   # per-worker: ref hex -> rank dict
_ENCODE_MEMO: dict = {}  # per-worker: (ref hex, word) -> pieces


def _encode_word(word: str, rank: dict, cache_key: str) -> list[str]:
    memo_key = (cache_key, word)
    hit = _ENCODE_MEMO.get(memo_key)
    if hit is not None:
        return hit
    syms = _sym_init(word)
    while len(syms) > 1:
        ranked = [(rank.get((a, b)), i) for i, (a, b)
                  in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    if len(_ENCODE_MEMO) > 1 << 18:
        # size cap (same pattern as unigram._SEG_MEMO): workers are
        # pooled across jobs, so an unbounded word-type memo grows
        # with every distinct word ever seen until the worker OOMs
        _ENCODE_MEMO.clear()
    _ENCODE_MEMO[memo_key] = syms
    return syms


def bpe_encode_ds(docs, merges: list[tuple[str, str]]):
    """Streaming form: (doc_id, text) -> (doc_id, n_words, n_pieces,
    pieces_md5). Merge ranks broadcast once; per-worker memo caches
    word->pieces across batches."""
    import hashlib
    mref = ray.put(list(merges))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        key = mref.hex()
        rank = _RANK_CACHE.get(key)
        if rank is None:  # once per worker process, not per batch
            rank = {tuple(p): i for i, p in enumerate(ray.get(mref))}
            _RANK_CACHE[key] = rank
        out = {"doc_id": batch["doc_id"].to_numpy().astype(np.int64),
               "n_words": [], "n_pieces": [], "pieces_md5": []}
        for text in batch["text"]:
            words = _tokens(text)
            pieces = []
            for w in words:
                pieces.extend(_encode_word(w, rank, key))
            out["n_words"].append(len(words))
            out["n_pieces"].append(len(pieces))
            out["pieces_md5"].append(hashlib.md5(
                "\x1f".join(pieces).encode()).hexdigest())
        return pd.DataFrame(out).astype({"n_words": "int64",
                                         "n_pieces": "int64"})

    return docs.map_batches(f, batch_format="pandas")


def bpe_pipeline(sf_dir: str, n_merges: int = 20):
    """Collecting form: train on the corpus, encode the corpus."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=n_merges)
    df = bpe_encode_ds(docs, merges).to_pandas()
    return merges, df.sort_values("doc_id").reset_index(drop=True)
