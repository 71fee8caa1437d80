"""TF-IDF and PMI vs sequential oracles: df counting, vocab
selection determinism, vector values, L2 norm, PMI math, window
semantics, and partitioning invariance."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines.termstats import (
    build_vocab, pmi_pairs, tfidf_pipeline, tfidf_vectors_ds)

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"

DOCS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog and the cat",
    "",
    "fish swim in the sea and the sea is deep",
]


def _docs_df(texts=DOCS):
    return pd.DataFrame({"doc_id": np.arange(len(texts),
                                             dtype=np.int64),
                         "text": texts})


def _ds(df, blocks=3):
    return rd.from_pandas(df).repartition(blocks)


def _ref_df():
    df = Counter()
    n = 0
    for t in DOCS:
        toks = t.lower().split()
        if not toks:
            continue
        n += 1
        for w in set(toks):
            df[w] += 1
    return df, n


class TestVocab:

    def test_df_and_ndocs(self):
        vocab = build_vocab(_ds(_docs_df()), vocab_size=1000,
                            num_buckets=4)
        want, n = _ref_df()
        assert vocab["n_docs"] == n
        assert dict(zip(vocab["terms"], vocab["df"])) == dict(want)

    def test_topk_deterministic(self):
        a = build_vocab(_ds(_docs_df(), 1), vocab_size=5,
                        num_buckets=4)
        b = build_vocab(_ds(_docs_df(), 6), vocab_size=5,
                        num_buckets=7)
        assert a["terms"] == b["terms"]
        want, _ = _ref_df()
        ordered = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        assert a["terms"] == [t for t, _ in ordered[:5]]

    def test_min_df(self):
        vocab = build_vocab(_ds(_docs_df()), vocab_size=1000,
                            min_df=2, num_buckets=4)
        want, _ = _ref_df()
        assert set(vocab["terms"]) == {t for t, c in want.items()
                                       if c >= 2}


class TestTfidf:

    def test_values_match_reference(self):
        df = _docs_df()
        vocab = build_vocab(_ds(df), vocab_size=1000, num_buckets=4)
        out = tfidf_vectors_ds(_ds(df), vocab, norm=False) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        idf = np.log((1 + vocab["n_docs"])
                     / (1 + vocab["df"].astype(float))) + 1
        idx = {t: i for i, t in enumerate(vocab["terms"])}
        for _, row in out.iterrows():
            toks = DOCS[int(row["doc_id"])].lower().split()
            want = np.zeros(len(idx))
            for w in toks:
                want[idx[w]] += 1
            want *= idf
            np.testing.assert_allclose(np.asarray(row["tfidf"]),
                                       want, atol=1e-12)

    def test_l2_norm(self):
        df = _docs_df()
        vocab = build_vocab(_ds(df), vocab_size=1000, num_buckets=4)
        out = tfidf_vectors_ds(_ds(df), vocab, norm=True).to_pandas()
        for _, row in out.iterrows():
            v = np.asarray(row["tfidf"])
            n = np.linalg.norm(v)
            assert n == 0.0 or abs(n - 1.0) < 1e-12

    def test_oov_terms_ignored(self):
        df = _docs_df()
        vocab = build_vocab(_ds(df), vocab_size=3, num_buckets=4)
        out = tfidf_vectors_ds(_ds(df), vocab, norm=False).to_pandas()
        assert all(len(v) == 3 for v in out["tfidf"])

    def test_pipeline_on_real_table(self):
        out = tfidf_pipeline(SF, vocab_size=16)
        assert list(out.columns) == ["doc_id", "tfidf"]
        assert len(out) == 500
        # the synthetic table's full vocab is ~31 terms, so a 16-term
        # cap must bind exactly
        assert all(len(v) == 16 for v in out["tfidf"])
        assert any(np.linalg.norm(v) > 0 for v in out["tfidf"])


class TestPmi:

    def _ref_pairs(self, window):
        pairs = Counter()
        for t in DOCS:
            toks = t.lower().split()
            for off in range(1, window + 1):
                for i in range(off, len(toks)):
                    a, b = sorted((toks[i - off], toks[i]))
                    pairs[(a, b)] += 1
        return pairs

    def test_matches_reference(self):
        got = pmi_pairs(_ds(_docs_df()), window=2, min_count=1,
                        vocab_size=1000, num_buckets=4)
        want = self._ref_pairs(2)
        uni = Counter()
        for t in DOCS:
            uni.update(t.lower().split())
        total = sum(uni.values())
        assert dict(zip(zip(got["a"], got["b"]), got["c_pair"])) \
            == dict(want)
        for _, r in got.iterrows():
            w = np.log(want[(r["a"], r["b"])] * total
                       / (uni[r["a"]] * uni[r["b"]]))
            np.testing.assert_allclose(r["pmi"], w, rtol=1e-12)
        assert (got["pmi"].to_numpy()[:-1]
                >= got["pmi"].to_numpy()[1:] - 1e-12).all()

    def test_window_one_is_bigrams_only(self):
        got = pmi_pairs(_ds(_docs_df()), window=1, min_count=1,
                        vocab_size=1000, num_buckets=4)
        want = self._ref_pairs(1)
        assert set(zip(got["a"], got["b"])) == set(want)

    def test_min_count_and_vocab_prune(self):
        got = pmi_pairs(_ds(_docs_df()), window=2, min_count=2,
                        vocab_size=4, num_buckets=4)
        vocab = build_vocab(_ds(_docs_df()), vocab_size=4,
                            num_buckets=4)
        assert (got["c_pair"] >= 2).all()
        assert set(got["a"]) | set(got["b"]) <= set(vocab["terms"])

    def test_partitioning_invariance(self):
        a = pmi_pairs(_ds(_docs_df(), 1), window=2, min_count=1,
                      vocab_size=1000, num_buckets=4)
        b = pmi_pairs(_ds(_docs_df(), 6), window=2, min_count=1,
                      vocab_size=1000, num_buckets=7)
        pd.testing.assert_frame_equal(a, b)


class TestHashedVectors:

    def test_matches_reference_and_invariance(self):
        from osm_sidewalkreator_ray.pipelines.termstats import (
            hashed_vectors_ds)
        df = _docs_df()
        a = hashed_vectors_ds(_ds(df, 1), dim=16, norm=False) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = hashed_vectors_ds(_ds(df, 6), dim=16, norm=False) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        for va, vb in zip(a["hv"], b["hv"]):
            np.testing.assert_allclose(va, vb, atol=1e-12)
        # sequential reference with the same hash
        for _, row in a.iterrows():
            toks = DOCS[int(row["doc_id"])].lower().split()
            want = np.zeros(16)
            if toks:
                h = pd.util.hash_array(
                    np.asarray(toks, dtype=object))
                col = (h % np.uint64(16)).astype(np.int64)
                sgn = np.where((h >> np.uint64(63)).astype(bool),
                               1.0, -1.0)
                np.add.at(want, col, sgn)
            np.testing.assert_allclose(np.asarray(row["hv"]), want,
                                       atol=1e-12)

    def test_norm_and_empty_doc(self):
        from osm_sidewalkreator_ray.pipelines.termstats import (
            hashed_vectors_ds)
        out = hashed_vectors_ds(_ds(_docs_df()), dim=32,
                                norm=True).to_pandas()
        byid = dict(zip(out["doc_id"],
                        (np.linalg.norm(v) for v in out["hv"])))
        assert byid[4] == 0.0  # the empty doc
        for i in (0, 1, 2, 3, 5):
            assert abs(byid[i] - 1.0) < 1e-12
