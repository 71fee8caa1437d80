"""Distributed BPE training/encoding vs a local reference
implementation with identical tie-breaks."""

from collections import Counter

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Single-process BPE with the same (count DESC, a ASC, b ASC)
    tie-break and the same min-count-2 stop."""
    from osm_sidewalkreator_ray.pipelines.bpe import (_EOW, _apply_merge,
                                                      _sym_init)
    types = {w: (_sym_init(w), n) for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        cnt = Counter()
        for syms, n in types.values():
            for p in zip(syms, syms[1:]):
                cnt[p] += n
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        types = {w: (_apply_merge(s, best[0]), n)
                 for w, (s, n) in types.items()}
    return merges


def _ref_encode(word, merges):
    from osm_sidewalkreator_ray.pipelines.bpe import _sym_init
    rank = {p: i for i, p in enumerate(merges)}
    syms = _sym_init(word)
    while len(syms) > 1:
        cand = [(rank[p], i) for i, p in
                enumerate(zip(syms, syms[1:])) if p in rank]
        if not cand:
            break
        _, i = min(cand)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_matches_reference():
    import ray.data as rd
    from osm_sidewalkreator_ray.pipelines import bpe as B

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = B.bpe_train(docs, n_merges=15)

    wc = Counter()
    for t in pd.read_parquet(f"{SF}/documents.parquet")["text"]:
        wc.update(B._tokens(t))
    want = _ref_bpe(dict(wc), 15)
    assert got == want
    assert len(got) == 15  # corpus is big enough to sustain 15 merges


@pytest.mark.usefixtures("ray_session")
def test_bpe_encode_matches_reference():
    import hashlib
    import ray.data as rd
    from osm_sidewalkreator_ray.pipelines import bpe as B

    docs = rd.from_items([
        {"doc_id": 1, "text": "the merge merges merged"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "the the the"}])
    merges = [("t", "h"), ("th", "e"), ("the", B._EOW), ("e", "r")]
    df = (B.bpe_encode_ds(docs, merges).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))

    for row in df.itertuples():
        text = {1: "the merge merges merged", 2: "",
                3: "the the the"}[row.doc_id]
        words = B._tokens(text)
        pieces = []
        for w in words:
            pieces.extend(_ref_encode(w, merges))
        assert row.n_words == len(words)
        assert row.n_pieces == len(pieces)
        assert row.pieces_md5 == hashlib.md5(
            "\x1f".join(pieces).encode()).hexdigest()
    # "the" fully merges into one piece incl. end-of-word
    assert df.loc[df["doc_id"] == 3, "n_pieces"].iloc[0] == 3


@pytest.mark.usefixtures("ray_session")
def test_bpe_pipeline_determinism():
    from osm_sidewalkreator_ray.pipelines import bpe as B
    m1, e1 = B.bpe_pipeline(SF, n_merges=8)
    m2, e2 = B.bpe_pipeline(SF, n_merges=8)
    assert m1 == m2
    pd.testing.assert_frame_equal(e1, e2)
