"""Luby maximal independent set: independence + maximality
properties on random graphs, partitioning determinism, and
equality with a local simulation using the same priorities."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.graph import (
    _prio, maximal_independent_set)

pytestmark = pytest.mark.usefixtures("ray_session")


def _random_edges(n=50, m=200, seed=5):
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


def _local_luby(edges, seed=0, max_iters=100):
    """Same algorithm, simulated single-process with _prio."""
    adj = _adjacency(edges)
    undec = set(adj)
    mis = set()
    for rnd in range(max_iters):
        if not undec:
            return mis
        vs = np.array(sorted(undec), dtype=np.int64)
        p = dict(zip(vs.tolist(), _prio(vs, rnd, seed).tolist()))
        winners = {v for v in undec
                   if all(p[v] < p[u] for u in adj[v] if u in undec)}
        mis |= winners
        for w in winners:
            undec.discard(w)
            undec -= adj[w]
    raise AssertionError("local Luby did not converge")


def _run(edges, **kw):
    ds = rd.from_pandas(edges).repartition(4)
    return maximal_independent_set(ds, **kw)


class TestMis:

    def test_independence_and_maximality(self):
        edges = _random_edges()
        got = _run(edges)
        adj = _adjacency(edges)
        mis = set(got.loc[got["in_mis"], "vertex"])
        # independence: no two MIS members adjacent
        for v in mis:
            assert not (adj[v] & mis)
        # maximality: every non-member has a MIS neighbor
        for v in set(adj) - mis:
            assert adj[v] & mis
        # every vertex of the graph is reported exactly once
        assert sorted(got["vertex"]) == sorted(adj)

    def test_equals_local_simulation(self):
        edges = _random_edges(n=40, m=150, seed=9)
        got = _run(edges, seed=3)
        want = _local_luby(edges, seed=3)
        assert set(got.loc[got["in_mis"], "vertex"]) == want

    def test_partitioning_invariance(self):
        edges = _random_edges(n=30, m=90, seed=2)
        one = maximal_independent_set(
            rd.from_pandas(edges).repartition(1), seed=1)
        many = maximal_independent_set(
            rd.from_pandas(edges).repartition(7), seed=1)
        pd.testing.assert_frame_equal(one, many)

    def test_path_graph(self):
        got = _run(pd.DataFrame({"src": [1, 2, 3],
                                 "dst": [2, 3, 4]}))
        mis = set(got.loc[got["in_mis"], "vertex"])
        adj = _adjacency(pd.DataFrame({"src": [1, 2, 3],
                                       "dst": [2, 3, 4]}))
        for v in mis:
            assert not (adj[v] & mis)
        for v in set(adj) - mis:
            assert adj[v] & mis

    def test_star_graph(self):
        # center + any leaf never together; leaves are independent
        got = _run(pd.DataFrame({"src": [0] * 6,
                                 "dst": list(range(1, 7))}))
        mis = set(got.loc[got["in_mis"], "vertex"])
        assert mis == {0} or mis == set(range(1, 7))

    def test_self_loops_dropped(self):
        got = _run(pd.DataFrame({"src": [1, 1, 2],
                                 "dst": [1, 2, 3]}))
        mis = set(got.loc[got["in_mis"], "vertex"])
        assert mis in ({1, 3}, {2})

    def test_empty(self):
        got = maximal_independent_set(
            pd.DataFrame({"src": [], "dst": []}).astype("int64"))
        assert len(got) == 0
        assert list(got.columns) == ["vertex", "in_mis"]
