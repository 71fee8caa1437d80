"""Exact duplicated-substring excision, Ray-Data-first.

Implements the ExactSubstr operator of Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499): every
span of >= L tokens that occurs verbatim more than once in the corpus
is removed, keeping exactly one copy (the globally first occurrence).
The paper's reference implementation builds one monolithic suffix
array over the concatenated corpus — a single-machine design. Here the
same semantics come out of a slim fixed-width shuffle:

1. ``map_batches`` over documents: hash every L-token window with a
   position-aware combination of per-token 64-bit hashes and emit
   ``(h: uint64, doc_id: int64, pos: int32)`` — ~20 bytes per corpus
   token, the same order as the suffix array's 8 bytes/byte but
   hash-partitionable, so it streams through the object store instead
   of needing one machine's RAM.
2. Bucket by ``h`` and co-locate equal hashes: within one hash value
   the first occurrence in ``(doc_id, pos)`` order is the keeper;
   every other occurrence emits an excise row ``(doc_id, pos)``.
   Only duplicated windows leave this stage, so the second shuffle is
   bounded by the corpus duplication rate, not corpus size.
3. Co-group excise rows with the documents on a ``doc_id`` bucket,
   mark tokens ``[pos, pos + L)`` of every excised window with a
   vectorized difference array, and drop marked runs.

The dedup unit is the whitespace token (``textops._tokens``), not the
byte, so "duplicated substring" means "duplicated window of >= L
tokens"; window identity is exact token identity (64-bit hashes — the
collision probability at 10^12 windows is ~3e-6 corpus-wide and any
collision only over-excises one window, it cannot corrupt text).

SELF-OVERLAPPING runs (periodic text like ``a a a a a a`` with L=2):
every window past the first duplicates it, and their excised spans
overlap the kept first window, so the run collapses BELOW one full
copy (here to a single token). This matches the paper's reference
behavior on periodic byte runs (every duplicated range except one is
cut, and the cuts overlap the keeper), is asserted by
``test_within_doc_overlapping_run``, and is what the SQL oracle
computes — "keeping exactly one copy" is exact only for
non-self-overlapping duplicates.

Output is ``(doc_id, n_tokens, n_removed, clean_md5)``: the digest
keeps the op SQL-checkable without shipping cleaned text to the
driver; a production run keeps the cleaned text in the pipeline
(``keep_text=True``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions.joins import _stable_bucket
from .textops import _read_docs, _tokens

_GOLDEN = np.uint64(0x9E3779B185EBCA87)


def _window_mults(L: int) -> np.ndarray:
    """L distinct odd multipliers (powers of an odd constant mod 2^64),
    fixed by L alone so equal windows hash equal everywhere."""
    mults = np.empty(L, dtype=np.uint64)
    m = _GOLDEN
    with np.errstate(over="ignore"):
        for j in range(L):
            mults[j] = m
            m = m * _GOLDEN  # wraps mod 2^64; odd * odd stays odd
    return mults


def _window_hashes(words: list[str], L: int,
                   mults: np.ndarray) -> np.ndarray:
    """Hash of every L-token window, position-aware within the window
    (same construction as textops._shingle_hashes, but keeping one hash
    per position instead of the unique set)."""
    n = len(words)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    th = pd.util.hash_array(np.asarray(words, dtype=object))
    acc = np.zeros(n - L + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            acc ^= th[j:n - L + 1 + j] * mults[j]
    return acc


def _emit_windows(batch: pd.DataFrame, L: int,
                  mults: np.ndarray) -> pd.DataFrame:
    hs, ids, pos = [], [], []
    for did, text in zip(batch["doc_id"], batch["text"]):
        wh = _window_hashes(_tokens(text), L, mults)
        if len(wh):
            hs.append(wh)
            ids.append(np.full(len(wh), did, dtype=np.int64))
            pos.append(np.arange(len(wh), dtype=np.int32))
    if not hs:
        return pd.DataFrame({"h": pd.Series([], dtype=np.uint64),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "pos": pd.Series([], dtype=np.int32)})
    return pd.DataFrame({"h": np.concatenate(hs),
                         "doc_id": np.concatenate(ids),
                         "pos": np.concatenate(pos)})


def _dup_occurrences(g: pd.DataFrame) -> pd.DataFrame:
    """All-but-first occurrence of every window hash in this bucket
    (bucketing is on h, so each hash's full occurrence set is here)."""
    g = g.sort_values(["h", "doc_id", "pos"], kind="mergesort")
    h = g["h"].to_numpy()
    dup = np.zeros(len(g), dtype=bool)
    if len(g) > 1:
        dup[1:] = h[1:] == h[:-1]
    return g.loc[dup, ["doc_id", "pos"]].reset_index(drop=True)


def excise_positions(docs, L: int = 50, num_buckets: int = 32):
    """Dataset of (doc_id, pos) windows to excise — every occurrence of
    a duplicated L-token window except the globally first one."""
    mults = _window_mults(L)
    windows = docs.map_batches(
        lambda b: _emit_windows(b, L, mults), batch_format="pandas")

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame({"h": pd.Series([], dtype=np.uint64),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "pos": pd.Series([], dtype=np.int32),
                                 "__b": pd.Series([], dtype=np.int32)})
        b = b.copy()
        b["__b"] = _stable_bucket(b["h"], num_buckets).astype(np.int32)
        return b

    return (windows.map_batches(bucketed, batch_format="pandas")
            .groupby("__b")
            .map_groups(lambda g: _dup_occurrences(g),
                        batch_format="pandas"))


def _excise_group(g: pd.DataFrame, L: int, keep_text: bool) -> pd.DataFrame:
    ex = g[g["kind"] == 1]
    dd = g[g["kind"] == 0]
    pos_by_doc = {did: sub["pos"].to_numpy(dtype=np.int64)
                  for did, sub in ex.groupby("doc_id")}
    out = {"doc_id": [], "n_tokens": [], "n_removed": [], "clean_md5": []}
    if keep_text:
        out["clean_text"] = []
    for did, text in zip(dd["doc_id"], dd["text"]):
        w = np.asarray(_tokens(text), dtype=object)
        ps = pos_by_doc.get(did)
        if ps is not None and len(w):
            diff = np.zeros(len(w) + 1, dtype=np.int64)
            np.add.at(diff, ps, 1)
            np.add.at(diff, np.minimum(ps + L, len(w)), -1)
            marked = np.cumsum(diff[:-1]) > 0
        else:
            marked = np.zeros(len(w), dtype=bool)
        clean = " ".join(w[~marked])
        out["doc_id"].append(did)
        out["n_tokens"].append(len(w))
        out["n_removed"].append(int(marked.sum()))
        out["clean_md5"].append(hashlib.md5(clean.encode()).hexdigest())
        if keep_text:
            out["clean_text"].append(clean)
    df = pd.DataFrame(out)
    return df.astype({"doc_id": "int64", "n_tokens": "int64",
                      "n_removed": "int64"})


def exact_substring_dedup_ds(docs, L: int = 50, num_buckets: int = 32,
                             keep_text: bool = False):
    """Streaming form: documents Dataset (doc_id, text) -> Dataset of
    (doc_id, n_tokens, n_removed, clean_md5[, clean_text])."""
    excise = excise_positions(docs, L=L, num_buckets=num_buckets)

    def tag_docs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "pos": np.full(len(b), -1, dtype=np.int64),
            "text": b["text"],
            "kind": np.zeros(len(b), dtype=np.int8),
            "__b": _stable_bucket(b["doc_id"], num_buckets).astype(np.int32),
        })

    def tag_excise(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "doc_id" not in b.columns:
            b = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "pos": pd.Series([], dtype=np.int32)})
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "pos": b["pos"].astype("int64"),
            "text": np.full(len(b), "", dtype=object),
            "kind": np.ones(len(b), dtype=np.int8),
            "__b": _stable_bucket(b["doc_id"], num_buckets).astype(np.int32),
        })

    tagged = (docs.map_batches(tag_docs, batch_format="pandas")
              .union(excise.map_batches(tag_excise, batch_format="pandas")))
    return (tagged.groupby("__b")
            .map_groups(lambda g: _excise_group(g, L, keep_text),
                        batch_format="pandas"))


def exact_substring_dedup(sf_dir: str, L: int = 8):
    """Driver-oracle wrapper (small results only). L defaults low here
    so the synthetic corpus actually contains duplicated windows; the
    paper's production value is 50."""
    out = exact_substring_dedup_ds(
        _read_docs(sf_dir, ["doc_id", "text"]), L=L)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


# The SQL mirror: windows via 1-indexed array slices, "rn > 1 over
# (gram ORDER BY doc_id, i)" = all-but-first occurrence, marked token
# set as a lateral unnest, excision as a LEFT-JOIN filter. Grams are
# compared as strings (exact), the Ray side as 64-bit hashes.
EXACT_SUBSTRING_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS a
  FROM documents),
w AS (
  SELECT doc_id, i, array_to_string(a[i:i+{L}-1], ' ') AS gram
  FROM (SELECT doc_id, a, unnest(generate_series(1, len(a)-{L}+1)) AS i
        FROM toks WHERE len(a) >= {L})),
dup AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i,
           ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
    FROM w) WHERE rn > 1),
marked AS (
  SELECT DISTINCT dup.doc_id, dup.i + t.j AS ti
  FROM dup, unnest(generate_series(0, {L}-1)) AS t(j)),
tok AS (
  SELECT doc_id, i AS ti, a[i] AS tk
  FROM (SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i
        FROM toks)),
agg AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) FILTER (WHERE m.ti IS NOT NULL) AS BIGINT)
           AS n_removed,
         md5(COALESCE(string_agg(t.tk, ' ' ORDER BY t.ti)
                      FILTER (WHERE m.ti IS NULL), '')) AS clean_md5
  FROM tok t LEFT JOIN marked m ON t.doc_id = m.doc_id AND t.ti = m.ti
  GROUP BY t.doc_id)
SELECT d.doc_id,
       COALESCE(g.n_tokens, 0) AS n_tokens,
       COALESCE(g.n_removed, 0) AS n_removed,
       COALESCE(g.clean_md5, md5('')) AS clean_md5
FROM documents d LEFT JOIN agg g USING (doc_id)
ORDER BY d.doc_id
""".replace("{L}", "8")
