"""Fellegi-Sunter record linkage: EM recovery on a known generative
model, and a DuckDB oracle for the blocked-pair weights over the real
customer x supplier tables (nationkey blocking)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines.linkage import (
    agreement_pairs_ds, em_fellegi_sunter, fs_weights_ds,
    pattern_histogram, pattern_weights, record_linkage)

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _expected_counts(m, u, p, total):
    """Exact expected pattern counts of the FS generative model —
    deterministic input for the EM recovery test."""
    k = len(m)
    idx = np.arange(1 << k)
    g = ((idx[:, None] >> np.arange(k)[None, :]) & 1).astype(float)
    pm = np.prod(np.where(g, m, 1 - np.asarray(m)), axis=1)
    pu = np.prod(np.where(g, u, 1 - np.asarray(u)), axis=1)
    return np.rint(total * (p * pm + (1 - p) * pu)).astype(np.int64)


class TestEM:

    def test_recovers_planted_m_u(self):
        m = np.array([0.95, 0.85, 0.9])
        u = np.array([0.05, 0.2, 0.1])
        p = 0.15
        counts = _expected_counts(m, u, p, 2_000_000)
        est = em_fellegi_sunter(counts, 3)
        np.testing.assert_allclose(est["m"], m, atol=0.02)
        np.testing.assert_allclose(est["u"], u, atol=0.02)
        assert abs(est["p"] - p) < 0.02

    def test_mirror_guard(self):
        """Initializing in the mirrored basin still returns m >= u."""
        m = np.array([0.9, 0.8])
        u = np.array([0.1, 0.15])
        counts = _expected_counts(m, u, 0.2, 500_000)
        est = em_fellegi_sunter(counts, 2, init_m=0.2, init_u=0.8,
                                init_p=0.8)
        assert est["m"].mean() >= est["u"].mean()
        # a mirrored start converges to a nearby (not identical)
        # local optimum; the guard restores the labeling, values land
        # within a few points of truth
        np.testing.assert_allclose(np.sort(est["m"]), np.sort(m),
                                   atol=0.06)

    def test_weight_table_shape(self):
        w = pattern_weights([0.9, 0.9], [0.1, 0.1])
        assert w.shape == (4,)
        # all-agree is the max, all-disagree the min
        assert w[3] == w.max() and w[0] == w.min()
        assert w[3] > 0 > w[0]


def _derived_customer():
    df = pd.read_parquet(f"{SF}/customer.parquet")
    return pd.DataFrame({
        "c_custkey": df["c_custkey"],
        "c_nationkey": df["c_nationkey"],
        "bal_bucket_a": np.floor(df["c_acctbal"] / 100).astype(np.int64),
        "bal_pos_a": (df["c_acctbal"] >= 0).astype(np.int64),
        "name_digit_a": df["c_name"].str[-1],
    })


def _derived_supplier():
    df = pd.read_parquet(f"{SF}/supplier.parquet")
    return pd.DataFrame({
        "s_suppkey": df["s_suppkey"],
        "s_nationkey": df["s_nationkey"],
        "bal_bucket_b": np.floor(df["s_acctbal"] / 100).astype(np.int64),
        "bal_pos_b": (df["s_acctbal"] >= 0).astype(np.int64),
        "name_digit_b": df["s_name"].str[-1],
    })


FIELDS = [("bal_bucket_a", "bal_bucket_b"),
          ("bal_pos_a", "bal_pos_b"),
          ("name_digit_a", "name_digit_b")]
M = np.array([0.9, 0.95, 0.85])
U = np.array([0.02, 0.5, 0.1])

ORACLE_SQL = f"""
WITH ca AS (
  SELECT c_custkey, c_nationkey,
         CAST(FLOOR(c_acctbal / 100) AS BIGINT) AS bb,
         (c_acctbal >= 0) AS bp,
         substr(c_name, length(c_name), 1) AS nd
  FROM '{SF}/customer.parquet'
), sb AS (
  SELECT s_suppkey, s_nationkey,
         CAST(FLOOR(s_acctbal / 100) AS BIGINT) AS bb,
         (s_acctbal >= 0) AS bp,
         substr(s_name, length(s_name), 1) AS nd
  FROM '{SF}/supplier.parquet'
)
SELECT ca.c_custkey AS id_a, sb.s_suppkey AS id_b,
  (CASE WHEN ca.bb = sb.bb THEN 1 ELSE 0 END)
  + 2 * (CASE WHEN ca.bp = sb.bp THEN 1 ELSE 0 END)
  + 4 * (CASE WHEN ca.nd = sb.nd THEN 1 ELSE 0 END) AS pattern,
  (CASE WHEN ca.bb = sb.bb THEN log2({M[0]}/{U[0]})
        ELSE log2({1 - M[0]}/{1 - U[0]}) END)
  + (CASE WHEN ca.bp = sb.bp THEN log2({M[1]}/{U[1]})
          ELSE log2({1 - M[1]}/{1 - U[1]}) END)
  + (CASE WHEN ca.nd = sb.nd THEN log2({M[2]}/{U[2]})
          ELSE log2({1 - M[2]}/{1 - U[2]}) END) AS weight
FROM ca JOIN sb ON ca.c_nationkey = sb.s_nationkey
ORDER BY id_a, id_b
"""


class TestSqlOracle:

    def test_blocked_weights_match_duckdb(self):
        pairs = agreement_pairs_ds(
            rd.from_pandas(_derived_customer()
                           .rename(columns={"c_nationkey": "nk"})),
            rd.from_pandas(_derived_supplier()
                           .rename(columns={"s_nationkey": "nk"})),
            on="nk", fields=FIELDS,
            id_a="c_custkey", id_b="s_suppkey", num_buckets=8)
        got = (fs_weights_ds(pairs, M, U).to_pandas()
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        want = duckdb.sql(ORACLE_SQL).df()
        assert len(got) == len(want)
        np.testing.assert_array_equal(got["id_a"].to_numpy(np.int64),
                                      want["id_a"].to_numpy(np.int64))
        np.testing.assert_array_equal(got["id_b"].to_numpy(np.int64),
                                      want["id_b"].to_numpy(np.int64))
        np.testing.assert_array_equal(
            got["pattern"].to_numpy(np.int64),
            want["pattern"].to_numpy(np.int64))
        np.testing.assert_allclose(got["weight"].to_numpy(),
                                   want["weight"].to_numpy(), atol=1e-9)

    def test_histogram_matches_sql_counts(self):
        a = _derived_customer().rename(columns={"c_nationkey": "nk"})
        b = _derived_supplier().rename(columns={"s_nationkey": "nk"})
        pairs = agreement_pairs_ds(rd.from_pandas(a), rd.from_pandas(b),
                                   on="nk", fields=FIELDS,
                                   id_a="c_custkey", id_b="s_suppkey",
                                   num_buckets=8)
        counts = pattern_histogram(pairs, 3)
        want = duckdb.sql(
            f"SELECT pattern, COUNT(*) n FROM ({ORACLE_SQL}) "
            "GROUP BY pattern").df()
        exp = np.zeros(8, dtype=np.int64)
        exp[want["pattern"].to_numpy(np.int64)] = \
            want["n"].to_numpy(np.int64)
        np.testing.assert_array_equal(counts, exp)


class TestEndToEnd:

    def test_record_linkage_planted_duplicates(self):
        """A table linked against a lightly-perturbed copy of itself:
        true pairs (same id) score above threshold, the EM path finds
        them without supplied m/u."""
        rng = np.random.RandomState(7)
        n = 400
        base = pd.DataFrame({
            "rid": np.arange(n),
            "block": np.arange(n) % 10,
            "f1": rng.randint(0, 500, n),
            "f2": rng.randint(0, 100, n),
            "f3": rng.randint(0, 200, n),
        })
        pert = base.copy()
        pert["rid"] = pert["rid"] + 10_000
        flip = rng.rand(n) < 0.1  # 10% of copies corrupt one field
        pert.loc[flip, "f1"] = pert.loc[flip, "f1"] + 1000
        fields = [("f1", "f1b"), ("f2", "f2b"), ("f3", "f3b")]
        bt = pert.rename(columns={"f1": "f1b", "f2": "f2b",
                                  "f3": "f3b"})
        out = record_linkage(base, bt, on="block", fields=fields,
                             id_a="rid", id_b="rid",
                             threshold=0.0, num_buckets=4).to_pandas()
        truth = out["id_b"] - out["id_a"] == 10_000
        # every uncorrupted true pair classified as a match
        clean = truth & (out["pattern"] == 7)
        assert clean.sum() == int((~flip).sum())
        assert out.loc[clean, "is_match"].all()
        # matches are overwhelmingly true pairs (blocking makes the
        # candidate set 40x the truth; weights separate them)
        matched = out[out["is_match"]]
        assert len(matched) > 0
        assert (matched["id_b"] - matched["id_a"] == 10_000).mean() \
            > 0.95

    def test_null_never_agrees(self):
        a = pd.DataFrame({"rid": [1], "block": [0],
                          "x": [np.nan]})
        b = pd.DataFrame({"sid": [2], "block": [0],
                          "y": [np.nan]})
        pairs = agreement_pairs_ds(a, b, on="block",
                                   fields=[("x", "y")],
                                   id_a="rid", id_b="sid",
                                   num_buckets=2).to_pandas()
        assert pairs["pattern"].tolist() == [0]
