"""Modularity Q: known closed-form values and a DuckDB oracle on a
random graph, plus composition with label_propagation."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from osm_sidewalkreator_ray.functions.graph import (
    label_propagation, modularity)

pytestmark = pytest.mark.usefixtures("ray_session")


def _oracle_q(edges: pd.DataFrame, labels: pd.DataFrame) -> float:
    con = duckdb.connect()
    con.register("raw_edges", edges)
    con.register("lab", labels)
    res = con.sql("""
        WITH e AS (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM raw_edges WHERE src <> dst
        ), m AS (SELECT COUNT(*)::DOUBLE AS c FROM e),
        ein AS (
          SELECT l1.label, COUNT(*)::DOUBLE AS c
          FROM e JOIN lab l1 ON e.u = l1.vertex
                 JOIN lab l2 ON e.v = l2.vertex
          WHERE l1.label = l2.label GROUP BY l1.label
        ), deg AS (
          SELECT lab.label, COUNT(*)::DOUBLE AS c
          FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) t
          JOIN lab ON t.x = lab.vertex GROUP BY lab.label
        )
        SELECT SUM(COALESCE(ein.c, 0) / m.c
                   - POW(deg.c / (2 * m.c), 2)) AS q
        FROM deg LEFT JOIN ein USING(label), m
    """).df()
    con.close()
    return float(res["q"][0])


def test_two_cliques_exact():
    e = pd.DataFrame({"src": [0, 1, 2, 3, 4, 5],
                      "dst": [1, 2, 0, 4, 5, 3]})
    lab = pd.DataFrame({"vertex": range(6),
                        "label": [0, 0, 0, 1, 1, 1]})
    assert modularity(e, lab, num_buckets=4) == pytest.approx(0.5)
    # everything in one community: Q = 0 by definition
    one = pd.DataFrame({"vertex": range(6), "label": [0] * 6})
    assert modularity(e, one, num_buckets=4) == pytest.approx(0.0)


def test_matches_duckdb_on_random_graph():
    rng = np.random.RandomState(3)
    e = pd.DataFrame({"src": rng.randint(0, 60, 400),
                      "dst": rng.randint(0, 60, 400)})
    lab = pd.DataFrame({"vertex": np.arange(60),
                        "label": np.arange(60) % 4})
    got = modularity(e, lab, num_buckets=8)
    assert got == pytest.approx(_oracle_q(e, lab), abs=1e-12)


def test_dedup_and_selfloops_ignored():
    base = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})
    noisy = pd.concat([base, base,  # duplicates
                       base.rename(columns={"src": "dst",
                                            "dst": "src"}),  # reversed
                       pd.DataFrame({"src": [0], "dst": [0]})])  # loop
    lab = pd.DataFrame({"vertex": range(3), "label": [0, 0, 0]})
    assert modularity(noisy, lab, num_buckets=4) == pytest.approx(
        modularity(base, lab, num_buckets=4))


def test_unlabeled_vertices_drop_from_terms():
    """Edges touching unlabeled vertices count in m only."""
    e = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 0, 4]})
    lab = pd.DataFrame({"vertex": [0, 1, 2], "label": [0, 0, 0]})
    # m = 4; labeled triangle: e_in = 3, deg = 6
    want = 3 / 4 - (6 / 8) ** 2
    assert modularity(e, lab, num_buckets=4) == pytest.approx(want)


def test_scores_lpa_partition():
    """Two planted dense blocks: the LPA labeling scores higher than
    a random split, and matches the oracle Q for the same labels."""
    rng = np.random.RandomState(11)
    rows = []
    for block, off in ((0, 0), (1, 20)):
        for _ in range(120):
            a, b = rng.randint(0, 20, 2) + off
            rows.append((a, b))
    rows.append((0, 20))  # one bridge edge
    e = pd.DataFrame(rows, columns=["src", "dst"])
    comm = label_propagation(e, iters=5, num_buckets=4)
    lab = comm.rename(columns={"community": "label"})
    q_lpa = modularity(e, lab, num_buckets=4)
    assert q_lpa == pytest.approx(_oracle_q(e, lab), abs=1e-12)
    rand = lab.copy()
    rand["label"] = rand["vertex"].to_numpy() % 2
    assert q_lpa > modularity(e, rand, num_buckets=4)
