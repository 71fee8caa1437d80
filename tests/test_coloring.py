"""Jones-Plassmann coloring: properness + Delta+1 bound on random
graphs, equality with sequential greedy in descending priority
order, and partitioning determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.graph import (
    _prio, greedy_coloring)

pytestmark = pytest.mark.usefixtures("ray_session")


def _random_edges(n=40, m=150, seed=5):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "src": rng.randint(0, n, m).astype(np.int64),
        "dst": rng.randint(0, n, m).astype(np.int64)})


def _adjacency(edges):
    e = edges.loc[edges["src"] != edges["dst"]]
    adj = {}
    for s, d in zip(e["src"], e["dst"]):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def _local_greedy(edges, seed=0):
    """Sequential greedy in DESCENDING fixed-priority order — the
    order Jones-Plassmann realizes in parallel."""
    adj = _adjacency(edges)
    vs = np.array(sorted(adj), dtype=np.int64)
    p = dict(zip(vs.tolist(), _prio(vs, 0, seed).tolist()))
    color = {}
    for v in sorted(adj, key=lambda v: (-p[v], v)):
        used = {color[u] for u in adj[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def _run(edges, **kw):
    kw.setdefault("num_buckets", 4)
    return greedy_coloring(rd.from_pandas(edges).repartition(4), **kw)


class TestColoring:

    def test_proper_and_bounded(self):
        edges = _random_edges()
        got = _run(edges)
        adj = _adjacency(edges)
        color = dict(zip(got["vertex"], got["color"]))
        assert set(color) == set(adj)
        for v, nbrs in adj.items():
            for u in nbrs:
                assert color[v] != color[u]
        maxdeg = max(len(nbrs) for nbrs in adj.values())
        assert got["color"].max() <= maxdeg

    def test_equals_sequential_greedy(self):
        edges = _random_edges(n=30, m=100, seed=8)
        got = _run(edges, seed=2)
        want = _local_greedy(edges, seed=2)
        assert dict(zip(got["vertex"], got["color"])) == want

    def test_partitioning_invariance(self):
        edges = _random_edges(n=25, m=80, seed=3)
        one = greedy_coloring(rd.from_pandas(edges).repartition(1),
                              seed=1, num_buckets=4)
        many = greedy_coloring(rd.from_pandas(edges).repartition(7),
                               seed=1, num_buckets=7)
        pd.testing.assert_frame_equal(one, many)

    def test_bipartite_two_colors(self):
        # complete bipartite K3,3 needs exactly 2 colors under greedy
        left, right = [0, 1, 2], [10, 11, 12]
        edges = pd.DataFrame(
            [(a, b) for a in left for b in right],
            columns=["src", "dst"])
        got = _run(edges)
        color = dict(zip(got["vertex"], got["color"]))
        assert {color[v] for v in left}.isdisjoint(
            {color[v] for v in right})
        assert got["color"].max() <= 1

    def test_clique_uses_n_colors(self):
        n = 5
        edges = pd.DataFrame(
            [(i, j) for i in range(n) for j in range(i + 1, n)],
            columns=["src", "dst"])
        got = _run(edges)
        assert sorted(got["color"]) == list(range(n))

    def test_self_loops_dropped(self):
        got = _run(pd.DataFrame({"src": [1, 1], "dst": [1, 2]}))
        color = dict(zip(got["vertex"], got["color"]))
        assert color[1] != color[2]

    def test_empty(self):
        got = greedy_coloring(
            pd.DataFrame({"src": [], "dst": []}).astype("int64"))
        assert len(got) == 0
        assert list(got.columns) == ["vertex", "color"]
