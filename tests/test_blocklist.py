"""Blocklist phrase gate (C4 badwords filter) vs DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd

from osm_sidewalkreator_ray.pipelines import textops as T

SF_DIR = "/root/testdata/sf0.001"


class TestBlocklistFilter:
    def test_matches_duckdb_oracle(self):
        got = T.blocklist_filter(SF_DIR)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
        want = con.sql(T.BLOCKLIST_FILTER_SQL).df()
        assert len(got) == len(want)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["n_hits"].tolist() == want["n_hits"].astype(
            "int64").tolist()
        assert got["keep"].tolist() == want["keep"].tolist()
        # the demo phrases actually occur in the corpus (the gate
        # does real work, it isn't vacuously keeping everything)
        assert (~got["keep"]).sum() > 0
        assert got["keep"].sum() > 0

    def test_exact_token_sequence_not_substring(self):
        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["a rescan joints b",      # substring, no match
                     "a scan join b",          # exact phrase
                     "scan join",              # phrase == whole doc
                     ""]}))                    # empty doc
        out = (T.blocklist_filter_ds(
            docs, T.blocklist_hashes(["scan join"]))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["keep"].tolist() == [True, False, False, True]
        assert out["n_hits"].tolist() == [0, 1, 1, 0]

    def test_distinct_phrase_count_and_repeats(self):
        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": [0],
            "text": ["bad one bad one good two bad one"]}))
        out = T.blocklist_filter_ds(
            docs, T.blocklist_hashes(
                ["bad one", "good two", "absent three"])).to_pandas()
        # 'bad one' appears 3x but counts once; 2 distinct phrases hit
        assert out["n_hits"].tolist() == [2]

    def test_object_ref_equals_plain(self):
        docs_df = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["x y z", "hash scan here", "sort merge",
                     "nothing", "dup window dup window", "q"]})
        hashes = T.blocklist_hashes(T._BLOCKLIST_DEMO)
        plain = (T.blocklist_filter_ds(rd.from_pandas(docs_df), hashes)
                 .to_pandas().sort_values("doc_id")
                 .reset_index(drop=True))
        via_ref = (T.blocklist_filter_ds(rd.from_pandas(docs_df),
                                         ray.put(hashes))
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
        pd.testing.assert_frame_equal(plain, via_ref)

    def test_partitioning_invariance(self):
        docs = T._read_docs(SF_DIR, ["doc_id", "text"])
        hashes = T.blocklist_hashes(T._BLOCKLIST_DEMO)
        one = (T.blocklist_filter_ds(docs.repartition(1), hashes)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        many = (T.blocklist_filter_ds(docs.repartition(13), hashes)
                .to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(one, many)
