"""Pareto skyline (DuckDB NOT-EXISTS dominance oracle, both
directions, duplicate handling) and per-group Pearson correlation
(DuckDB corr() GROUP BY oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.aggregates import corr_by, skyline

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


class TestSkyline:
    def test_maximize_matches_not_exists_oracle(self):
        ds = rd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_quantity",
                                      "l_extendedprice", "l_discount"])
        got = skyline(ds, ["l_quantity", "l_extendedprice",
                           "l_discount"], batch_size=512)
        want = duckdb.sql(f"""
            SELECT l_orderkey, l_quantity, l_extendedprice, l_discount
            FROM read_parquet('{SF}/lineitem.parquet') t
            WHERE NOT EXISTS (
              SELECT 1 FROM read_parquet('{SF}/lineitem.parquet') o
              WHERE o.l_quantity >= t.l_quantity
                AND o.l_extendedprice >= t.l_extendedprice
                AND o.l_discount >= t.l_discount
                AND (o.l_quantity > t.l_quantity
                     OR o.l_extendedprice > t.l_extendedprice
                     OR o.l_discount > t.l_discount))
            ORDER BY l_quantity, l_extendedprice, l_discount
        """).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    def test_mixed_directions_match_oracle(self):
        ds = rd.read_parquet(f"{SF}/customer.parquet",
                             columns=["c_custkey", "c_acctbal",
                                      "c_nationkey"])
        got = skyline(ds, ["c_acctbal", "c_nationkey"],
                      maximize=[True, False], batch_size=256)
        want = duckdb.sql(f"""
            SELECT c_custkey, c_acctbal, c_nationkey
            FROM read_parquet('{SF}/customer.parquet') t
            WHERE NOT EXISTS (
              SELECT 1 FROM read_parquet('{SF}/customer.parquet') o
              WHERE o.c_acctbal >= t.c_acctbal
                AND o.c_nationkey <= t.c_nationkey
                AND (o.c_acctbal > t.c_acctbal
                     OR o.c_nationkey < t.c_nationkey))
            ORDER BY c_acctbal, c_nationkey
        """).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    def test_duplicate_frontier_rows_all_kept(self):
        df = pd.DataFrame({"id": [1, 2, 3, 4],
                           "a": [5.0, 5.0, 1.0, 4.0],
                           "b": [7.0, 7.0, 1.0, 8.0]})
        got = skyline(rd.from_pandas(df).repartition(3), ["a", "b"])
        assert sorted(got["id"].tolist()) == [1, 2, 4]

    def test_candidate_cap_raises_loud(self):
        # anti-chain: every row on the frontier -> cap must raise,
        # not silently truncate
        n = 64
        df = pd.DataFrame({"a": np.arange(n, dtype=float),
                           "b": -np.arange(n, dtype=float)})
        with pytest.raises(RuntimeError, match="max_collect"):
            skyline(rd.from_pandas(df), ["a", "b"], max_collect=10)


class TestCorrBy:
    def test_matches_duckdb_corr_group_by(self):
        ds = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "value", "ts"])

        def add_epoch(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["ts_s"] = b["ts"].astype("int64") / 1e6
            return b

        got = corr_by(ds.map_batches(add_epoch, batch_format="pandas"),
                      "event_type", "value", "ts_s")
        want = duckdb.sql(f"""
            SELECT event_type, corr(value, epoch(ts)) AS corr,
                   COUNT(*) AS n_rows
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY event_type ORDER BY event_type
        """).df()
        assert got["event_type"].tolist() == want["event_type"].tolist()
        assert got["n_rows"].tolist() == want["n_rows"].tolist()
        np.testing.assert_allclose(got["corr"].to_numpy(),
                                   want["corr"].to_numpy(), rtol=1e-9)

    def test_degenerate_groups_are_nan(self):
        df = pd.DataFrame({"k": ["a", "a", "b", "c", "c"],
                           "x": [1.0, 1.0, 2.0, 1.0, 2.0],
                           "y": [3.0, 9.0, 5.0, 1.0, 2.0]})
        got = corr_by(rd.from_pandas(df).repartition(2), "k", "x", "y")
        by = dict(zip(got["k"], got["corr"]))
        assert np.isnan(by["a"])      # zero x-variance
        assert np.isnan(by["b"])      # single row
        assert by["c"] == pytest.approx(1.0)
