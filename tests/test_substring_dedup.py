"""Exact duplicated-substring excision (ExactSubstr, Lee et al. 2022):
planted-duplicate semantics, naive-reference equality, and the DuckDB
oracle (pytest-gated: the driver's 50-query export is full)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines import substring as S
from osm_sidewalkreator_ray.pipelines.textops import _tokens

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


def naive_substring_dedup(texts_by_id: dict[int, str], L: int):
    """Single-process reference: global first occurrence of each
    L-token window (by (doc_id, pos)) is kept, every other occurrence
    marks its L positions for excision."""
    toks = {d: _tokens(t) for d, t in texts_by_id.items()}
    seen: dict[tuple, tuple] = {}
    excise: dict[int, list[int]] = {d: [] for d in texts_by_id}
    for d in sorted(toks):
        w = toks[d]
        for i in range(len(w) - L + 1):
            key = tuple(w[i:i + L])
            if key in seen:
                excise[d].append(i)
            else:
                seen[key] = (d, i)
    out = []
    for d in sorted(toks):
        w = toks[d]
        marked = np.zeros(len(w), dtype=bool)
        for i in excise[d]:
            marked[i:i + L] = True
        clean = " ".join(np.asarray(w, dtype=object)[~marked])
        out.append({"doc_id": d, "n_tokens": len(w),
                    "n_removed": int(marked.sum()),
                    "clean_md5": hashlib.md5(clean.encode()).hexdigest(),
                    "clean_text": clean})
    return pd.DataFrame(out)


def _run_ds(texts_by_id: dict[int, str], L: int, **kw) -> pd.DataFrame:
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts_by_id), "text": list(texts_by_id.values())}))
    out = S.exact_substring_dedup_ds(docs, L=L, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_planted_duplicate_keeps_first_occurrence_only():
    shared = " ".join(f"tok{i}" for i in range(12))
    texts = {
        1: f"alpha beta {shared} gamma",
        2: f"{shared} delta epsilon zeta",
        3: f"one two three {shared}",
        4: "no duplication here at all in this short doc",
    }
    got = _run_ds(texts, L=10, keep_text=True)
    want = naive_substring_dedup(texts, L=10)
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True), check_dtype=False)
    # doc 1 holds the first occurrence -> intact; docs 2 and 3 lose it
    assert got.loc[got.doc_id == 1, "n_removed"].item() == 0
    assert got.loc[got.doc_id == 2, "n_removed"].item() == 12
    assert got.loc[got.doc_id == 3, "n_removed"].item() == 12
    assert got.loc[got.doc_id == 2, "clean_text"].item() == \
        "delta epsilon zeta"
    assert got.loc[got.doc_id == 4, "n_removed"].item() == 0


def test_within_doc_overlapping_run():
    # "a a a a a a" with L=2: windows at pos 1..4 duplicate pos 0,
    # marking tokens 1..5 -> only the first token survives
    got = _run_ds({7: "a a a a a a"}, L=2, keep_text=True)
    assert got["n_removed"].item() == 5
    assert got["clean_text"].item() == "a"


def test_short_and_empty_docs_pass_through():
    got = _run_ds({1: "", 2: "   ", 3: "just four tokens here"}, L=10)
    assert got["n_removed"].tolist() == [0, 0, 0]
    assert got["n_tokens"].tolist() == [0, 0, 4]
    assert got.loc[got.doc_id == 1, "clean_md5"].item() == \
        hashlib.md5(b"").hexdigest()


def test_naive_equality_on_corpus_sample():
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).head(120)
    texts = dict(zip(df["doc_id"].astype(int), df["text"]))
    got = _run_ds(texts, L=8)
    want = naive_substring_dedup(texts, L=8).drop(columns=["clean_text"])
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True), check_dtype=False)
    assert got["n_removed"].sum() > 0  # the check is non-vacuous


def test_duckdb_oracle_full_sf0001():
    got = S.exact_substring_dedup(SF, L=8)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    want = con.sql(S.EXACT_SUBSTRING_DEDUP_SQL).df()
    assert got["n_removed"].sum() > 0
    for c in ["doc_id", "n_tokens", "n_removed", "clean_md5"]:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
