"""DuckDB oracles for the term-stat / n-gram operators on the real
documents table: document frequencies, bigram counts (BOS padding
included), and window-1 PMI — the SQL-expressible slices of
termstats.py / lm.py."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines.lm import (
    _SEP, BOS, ngram_counts_ds)
from osm_sidewalkreator_ray.pipelines.termstats import (
    document_frequencies, pmi_pairs)
from osm_sidewalkreator_ray.pipelines.textops import _read_docs

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    return con


class TestSqlOracles:

    def test_document_frequencies(self):
        got = document_frequencies(
            _read_docs(SF, ["doc_id", "text"]),
            num_buckets=8).to_pandas()
        got = got.loc[got["term"] != "\x00docs"] \
            .sort_values("term").reset_index(drop=True)
        con = _con()
        want = con.sql(r"""
            WITH t AS (
              SELECT doc_id, unnest(regexp_split_to_array(
                  lower(trim(text)), '\s+')) AS term
              FROM documents WHERE trim(text) <> ''
            )
            SELECT term, COUNT(DISTINCT doc_id) AS df
            FROM t GROUP BY term ORDER BY term
        """).df()
        assert got["term"].tolist() == want["term"].tolist()
        np.testing.assert_array_equal(got["df"].to_numpy(),
                                      want["df"].to_numpy())

    def test_bigram_counts(self):
        got = ngram_counts_ds(_read_docs(SF, ["doc_id", "text"]),
                              n=2, num_buckets=8).to_pandas()
        got = got.loc[got["order"] == 2, ["gram", "c"]] \
            .sort_values("gram").reset_index(drop=True)
        con = _con()
        want = con.sql(rf"""
            WITH t AS (
              SELECT list_prepend('{BOS}', regexp_split_to_array(
                  lower(trim(text)), '\s+')) AS toks
              FROM documents WHERE trim(text) <> ''
            )
            SELECT toks[i] || chr(31) || toks[i+1] AS gram,
                   COUNT(*) AS c
            FROM t, UNNEST(generate_series(1, len(toks)-1)) AS u(i)
            GROUP BY gram ORDER BY gram
        """).df()
        assert got["gram"].tolist() == want["gram"].tolist()
        np.testing.assert_array_equal(got["c"].to_numpy(),
                                      want["c"].to_numpy())

    def test_pmi_window1(self):
        got = pmi_pairs(_read_docs(SF, ["doc_id", "text"]),
                        window=1, min_count=1, vocab_size=10_000,
                        num_buckets=8) \
            .sort_values(["a", "b"]).reset_index(drop=True)
        con = _con()
        want = con.sql(r"""
            WITH t AS (
              SELECT regexp_split_to_array(
                  lower(trim(text)), '\s+') AS toks
              FROM documents WHERE trim(text) <> ''
            ), pairs AS (
              SELECT least(toks[i], toks[i+1]) AS a,
                     greatest(toks[i], toks[i+1]) AS b
              FROM t, UNNEST(generate_series(1, len(toks)-1)) AS u(i)
            ), uni AS (
              SELECT unnest(toks) AS term FROM t
            ), cnt AS (
              SELECT term, COUNT(*) AS c FROM uni GROUP BY term
            ), tot AS (SELECT COUNT(*) AS n FROM uni)
            SELECT p.a, p.b, COUNT(*) AS c_pair,
                   any_value(ca.c) AS c_a, any_value(cb.c) AS c_b,
                   ln(COUNT(*) * any_value(tot.n)
                      / (any_value(ca.c) * any_value(cb.c))) AS pmi
            FROM pairs p, tot
            JOIN cnt ca ON ca.term = p.a
            JOIN cnt cb ON cb.term = p.b
            GROUP BY p.a, p.b ORDER BY a, b
        """).df()
        assert got["a"].tolist() == want["a"].tolist()
        assert got["b"].tolist() == want["b"].tolist()
        np.testing.assert_array_equal(got["c_pair"].to_numpy(),
                                      want["c_pair"].to_numpy())
        np.testing.assert_allclose(got["pmi"].to_numpy(),
                                   want["pmi"].to_numpy(), rtol=1e-9)
