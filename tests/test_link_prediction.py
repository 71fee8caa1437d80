"""Link-prediction scores (common neighbors / Jaccard / Adamic-Adar)
vs a full DuckDB wedge-join oracle and hand-checked tiny graphs."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.graph import link_prediction

pytestmark = pytest.mark.usefixtures("ray_session")


def _random_edges(n=60, m=240, seed=3):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64) * 7 + 1
    dst = rng.randint(0, n, m).astype(np.int64) * 7 + 1
    # keep some self-loops and duplicates on purpose: canon drops them
    return pd.DataFrame({"src": src, "dst": dst})


ORACLE = """
WITH canon AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM edges WHERE src <> dst),
sym AS (SELECT u AS a, v AS b FROM canon
        UNION ALL SELECT v, u FROM canon),
deg AS (SELECT a, COUNT(*) AS d FROM sym GROUP BY a),
wedge AS (
  SELECT s1.b AS u, s2.b AS v, s1.a AS w
  FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
  {center_filter}),
scored AS (
  SELECT w.u, w.v, COUNT(*) AS cn, SUM(1.0 / LN(dw.d)) AS aa
  FROM wedge w JOIN deg dw ON dw.a = w.w GROUP BY w.u, w.v),
cand AS (
  SELECT s.* FROM scored s
  LEFT JOIN canon c ON c.u = s.u AND c.v = s.v
  WHERE {edge_filter})
SELECT c.u, c.v, cn,
       cn * 1.0 / (du.d + dv.d - cn) AS jaccard, aa
FROM cand c JOIN deg du ON du.a = c.u JOIN deg dv ON dv.a = c.v
ORDER BY c.u, c.v
"""


def _oracle(edges, exclude_existing=True, max_degree=None):
    con = duckdb.connect()
    con.register("edges", edges)
    cf = (f"WHERE (SELECT d FROM deg WHERE a = s1.a) <= {max_degree}"
          if max_degree is not None else "")
    ef = "c.u IS NULL" if exclude_existing else "TRUE"
    return con.execute(
        ORACLE.format(center_filter=cf, edge_filter=ef)).df()


COLS = ["u", "v", "common_neighbors", "jaccard", "adamic_adar"]


def _run(edges, **kw):
    ds = link_prediction(rd.from_pandas(edges).repartition(5), **kw)
    df = ds.to_pandas()
    if not len(df):
        # Ray's to_pandas() loses the schema on fully-empty datasets;
        # the Dataset itself still carries it (asserted in the
        # schema test below).
        return pd.DataFrame(columns=COLS)
    return df.sort_values(["u", "v"]).reset_index(drop=True)


class TestLinkPrediction:

    def test_matches_duckdb_oracle(self):
        edges = _random_edges()
        got = _run(edges)
        want = _oracle(edges)
        assert got[["u", "v"]].values.tolist() \
            == want[["u", "v"]].values.tolist()
        assert got["common_neighbors"].tolist() == want["cn"].tolist()
        np.testing.assert_allclose(got["jaccard"], want["jaccard"],
                                   rtol=1e-9)
        np.testing.assert_allclose(got["adamic_adar"], want["aa"],
                                   rtol=1e-9)

    def test_include_existing_edges(self):
        edges = _random_edges(seed=8)
        got = _run(edges, exclude_existing=False)
        want = _oracle(edges, exclude_existing=False)
        assert got[["u", "v"]].values.tolist() \
            == want[["u", "v"]].values.tolist()
        np.testing.assert_allclose(got["adamic_adar"], want["aa"],
                                   rtol=1e-9)
        # strictly more pairs than the anti-joined variant
        assert len(got) > len(_run(edges))

    def test_max_degree_drops_hub_centers(self):
        # partial filter: 45/60 centers survive the cap
        edges = _random_edges(n=60, m=240, seed=3)
        got = _run(edges, max_degree=8)
        want = _oracle(edges, max_degree=8)
        assert 0 < len(got) < len(_oracle(edges))
        assert got[["u", "v"]].values.tolist() \
            == want[["u", "v"]].values.tolist()
        np.testing.assert_allclose(got["adamic_adar"], want["aa"],
                                   rtol=1e-9)

    def test_all_centers_capped_yields_empty(self):
        # every center exceeds the cap -> empty result (Ray Data
        # drops empty blocks, so the schema is gone too; count only)
        edges = _random_edges(n=30, m=300, seed=2)
        ds = link_prediction(rd.from_pandas(edges).repartition(5),
                             max_degree=6)
        assert ds.count() == 0

    def test_path_graph_hand_check(self):
        got = _run(pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))
        assert got[["u", "v"]].values.tolist() == [[1, 3]]
        assert got["common_neighbors"].tolist() == [1]
        np.testing.assert_allclose(got["jaccard"], [1.0])
        np.testing.assert_allclose(got["adamic_adar"],
                                   [1.0 / np.log(2.0)])

    def test_triangle_has_no_candidates(self):
        got = _run(pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]}))
        assert len(got) == 0
