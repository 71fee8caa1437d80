"""profile_ds / check_constraints vs DuckDB oracles on sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    c.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return c


@pytest.mark.usefixtures("ray_session")
class TestProfile:
    def test_lineitem_numeric_exact_vs_duckdb(self, con):
        from osm_sidewalkreator_ray.functions.profile import profile_ds
        cols = ["l_quantity", "l_extendedprice", "l_orderkey"]
        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=cols)
        got = profile_ds(ds, cols).set_index("column")
        for c in cols:
            want = con.sql(
                f"SELECT COUNT(*) n, COUNT(*)-COUNT({c}) n_nulls, "
                f"MIN({c}) mn, MAX({c}) mx, AVG({c}) mean, "
                f"COUNT(DISTINCT {c}) d FROM lineitem").df().iloc[0]
            r = got.loc[c]
            assert r["rows"] == want["n"]
            assert r["nulls"] == want["n_nulls"]
            assert np.isclose(r["min"], want["mn"])
            assert np.isclose(r["max"], want["mx"])
            assert np.isclose(r["mean"], want["mean"], atol=1e-4)
            assert abs(r["approx_distinct"] - want["d"]) \
                <= 0.05 * want["d"] + 2

    def test_string_profile_and_top_values(self, con):
        from osm_sidewalkreator_ray.functions.profile import profile_ds
        ds = rd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_returnflag"])
        got = profile_ds(ds, ["l_returnflag"]).iloc[0]
        want = con.sql(
            "SELECT MIN(l_returnflag) mn, MAX(l_returnflag) mx, "
            "COUNT(DISTINCT l_returnflag) d FROM lineitem").df().iloc[0]
        assert got["min_str"] == want["mn"]
        assert got["max_str"] == want["mx"]
        mode = con.sql(
            "SELECT l_returnflag v, COUNT(*) c FROM lineitem "
            "GROUP BY 1 ORDER BY c DESC, v LIMIT 1").df().iloc[0]
        assert got["top_values"][0] == mode["v"]
        # MG count is a lower bound, and exact here (few distincts)
        assert got["top_counts"][0] == mode["c"]

    def test_nulls_counted(self):
        from osm_sidewalkreator_ray.functions.profile import profile_ds
        df = pd.DataFrame({"x": [1.0, np.nan, 3.0, np.nan],
                           "s": ["a", None, "b", "a"]})
        got = profile_ds(rd.from_pandas(df).repartition(3)) \
            .set_index("column")
        assert got.loc["x", "nulls"] == 2
        assert got.loc["x", "null_frac"] == 0.5
        assert got.loc["s", "nulls"] == 1
        assert got.loc["s", "approx_distinct"] == 2
        assert got.loc["s", "top_values"][0] == "a"


@pytest.mark.usefixtures("ray_session")
class TestConstraints:
    def test_lineitem_rules_vs_duckdb(self, con):
        from osm_sidewalkreator_ray.functions.profile import \
            check_constraints
        li = rd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_quantity", "l_returnflag"])
        orders = rd.read_parquet(f"{SF}/orders.parquet",
                                 columns=["o_orderkey"])
        got = check_constraints(li, [
            {"kind": "not_null", "column": "l_quantity"},
            {"kind": "in_range", "column": "l_quantity",
             "lo": 1, "hi": 25},
            {"kind": "accepted_values", "column": "l_returnflag",
             "values": ["A", "N", "R"]},
            {"kind": "unique", "column": "l_orderkey"},
            {"kind": "foreign_key", "column": "l_orderkey",
             "parent": orders, "parent_column": "o_orderkey"},
        ])
        want_range = con.sql(
            "SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NULL "
            "OR l_quantity < 1 OR l_quantity > 25").df().iloc[0, 0]
        want_dupes = con.sql(
            "SELECT COUNT(*) - COUNT(DISTINCT l_orderkey) "
            "FROM lineitem").df().iloc[0, 0]
        want_fk = con.sql(
            "SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN "
            "(SELECT o_orderkey FROM orders)").df().iloc[0, 0]
        g = got.set_index("rule")["violations"]
        assert g["not_null"] == 0
        assert g["in_range"] == want_range
        assert g["accepted_values"] == 0
        assert g["unique"] == want_dupes
        assert g["foreign_key"] == want_fk

    def test_broken_fk_and_nulls(self):
        from osm_sidewalkreator_ray.functions.profile import \
            check_constraints
        child = rd.from_pandas(pd.DataFrame(
            {"k": [1, 2, 3, 3, 9, 9, 9]})).repartition(3)
        parent = rd.from_pandas(pd.DataFrame({"pk": [1, 2, 3]}))
        got = check_constraints(child, [
            {"kind": "foreign_key", "column": "k", "parent": parent,
             "parent_column": "pk"},
            {"kind": "unique", "column": "k"},
        ])
        g = got.set_index("rule")
        assert g.loc["foreign_key", "violations"] == 3  # three 9s
        assert not g.loc["foreign_key", "passed"]
        assert g.loc["unique", "violations"] == 3  # extra 3, two extra 9s

    def test_matches_rule(self):
        from osm_sidewalkreator_ray.functions.profile import \
            check_constraints
        ds = rd.from_pandas(pd.DataFrame(
            {"u": ["http://a", "https://b", "ftp://c"]}))
        got = check_constraints(
            ds, [{"kind": "matches", "column": "u",
                  "pattern": r"https?://"}])
        assert got["violations"][0] == 1
