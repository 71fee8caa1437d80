"""Stupid-backoff n-gram LM vs a sequential Counter/loop oracle:
count equality, score equality at n=1/2/3, pruning + backoff
semantics, OOV floor, partitioning invariance, filter stage, and a
sanity ordering check on the real documents table."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines.lm import (
    BOS, _SEP, lm_ppl_filter_ds, lm_quality, lm_score_ds,
    ngram_counts_ds, ngram_lm_train)

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


def _ref_counts(texts, n):
    agg = Counter()
    for t in texts:
        toks = t.lower().split()
        if not toks:
            continue
        padded = [BOS] * (n - 1) + toks
        for o in range(1, n + 1):
            for i in range(len(padded) - o + 1):
                agg[_SEP.join(padded[i:i + o])] += 1
    return agg


def _ref_score(toks, model):
    n, tables, total, bo = (model["n"], model["tables"],
                            model["total"], model["backoff"])
    padded = [BOS] * (n - 1) + toks
    lp = 0.0
    for i in range(n - 1, len(padded)):
        w = padded[i]
        prob = None
        for o in range(n, 1, -1):
            full = _SEP.join(padded[i - o + 1:i + 1])
            ctx = _SEP.join(padded[i - o + 1:i])
            if tables[o - 1].get(full, 0) > 0 \
                    and tables[o - 2].get(ctx, 0) > 0:
                prob = (tables[o - 1][full] / tables[o - 2][ctx]) \
                    * bo ** (n - o)
                break
        if prob is None:
            c = tables[0].get(w, 0)
            base = c / total if c > 0 else 1.0 / total
            prob = base * bo ** (n - 1)
        lp += np.log(prob)
    return lp


class TestCounts:

    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_equals_counter_oracle(self, n):
        got = ngram_counts_ds(_ds(_docs_df()), n,
                              num_buckets=4).to_pandas()
        want = _ref_counts(DOCS, n)
        assert dict(zip(got["gram"], got["c"])) == dict(want)
        assert (got["order"] ==
                got["gram"].str.count(_SEP) + 1).all()

    def test_partitioning_invariance(self):
        a = ngram_counts_ds(_ds(_docs_df(), 1), 2, num_buckets=4) \
            .to_pandas().sort_values("gram").reset_index(drop=True)
        b = ngram_counts_ds(_ds(_docs_df(), 5), 2, num_buckets=7) \
            .to_pandas().sort_values("gram").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestTrainAndScore:

    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_scores_equal_reference(self, n):
        df = _docs_df()
        model = ngram_lm_train(_ds(df), n=n, num_buckets=4)
        got = lm_score_ds(_ds(df), model).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        for _, row in got.iterrows():
            toks = DOCS[int(row["doc_id"])].lower().split()
            assert row["n_tokens"] == len(toks)
            if not toks:
                assert row["logprob"] == 0.0
                assert np.isnan(row["ppl"])
                continue
            want = _ref_score(toks, model)
            np.testing.assert_allclose(row["logprob"], want,
                                       rtol=1e-12)
            np.testing.assert_allclose(
                row["ppl"], np.exp(-want / len(toks)), rtol=1e-12)

    def test_pruning_forces_backoff(self):
        df = _docs_df()
        full = ngram_lm_train(_ds(df), n=2, min_count=1,
                              num_buckets=4)
        pruned = ngram_lm_train(_ds(df), n=2, min_count=2,
                                num_buckets=4)
        # singleton bigrams are gone, unigrams survive untouched
        assert all(c >= 2 for c in pruned["tables"][1].values())
        assert pruned["tables"][0] == full["tables"][0]
        assert pruned["total"] == full["total"]
        # a doc whose bigrams were all singletons now scores lower
        probe = pd.DataFrame({"doc_id": [0],
                              "text": ["fish swim in the sea"]})
        s_full = lm_score_ds(_ds(probe, 1), full).to_pandas()
        s_pruned = lm_score_ds(_ds(probe, 1), pruned).to_pandas()
        assert s_pruned["logprob"][0] < s_full["logprob"][0]

    def test_oov_floor(self):
        model = ngram_lm_train(_ds(_docs_df()), n=2, num_buckets=4)
        probe = pd.DataFrame({"doc_id": [0], "text": ["zzz qqq"]})
        got = lm_score_ds(_ds(probe, 1), model).to_pandas()
        want = 2 * np.log(model["backoff"] / model["total"])
        np.testing.assert_allclose(got["logprob"][0], want,
                                   rtol=1e-12)

    def test_score_partitioning_invariance(self):
        df = _docs_df()
        model = ngram_lm_train(_ds(df), n=3, num_buckets=4)
        a = lm_score_ds(_ds(df, 1), model).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = lm_score_ds(_ds(df, 6), model).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_ppl_filter(self):
        df = _docs_df()
        model = ngram_lm_train(_ds(df), n=2, num_buckets=4)
        scored = lm_score_ds(_ds(df), model).to_pandas()
        cut = float(scored["ppl"].dropna().median())
        kept = lm_ppl_filter_ds(_ds(df), model, cut).to_pandas()
        want = scored.loc[scored["ppl"].notna()
                          & (scored["ppl"] <= cut), "doc_id"]
        assert sorted(kept["doc_id"]) == sorted(want)


class TestRealTable:

    def test_lm_quality_sanity(self):
        out = lm_quality(SF, n=2, min_count=2)
        assert list(out.columns) == ["doc_id", "n_tokens",
                                     "logprob", "ppl"]
        assert len(out) == 500
        assert (out.loc[out["n_tokens"] > 0, "ppl"] > 1.0).all()
        # an in-distribution doc must beat character soup
        df = pd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        model = ngram_lm_train(_ds(df, 4), n=2, min_count=2)
        probe = pd.DataFrame({
            "doc_id": [0, 1],
            "text": [df["text"][0], "xq zvw qqj kkx pzf vvb"]})
        s = lm_score_ds(_ds(probe, 1), model).to_pandas() \
            .sort_values("doc_id")
        assert s["ppl"].iloc[0] < s["ppl"].iloc[1]
