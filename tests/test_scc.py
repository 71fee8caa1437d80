"""Coloring-algorithm SCC vs a local Tarjan oracle: cycles, DAGs,
bridged cycles, self-loops, random digraphs, partitioning
invariance, and the empty graph."""

import sys

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.graph import (
    strongly_connected_components)

pytestmark = pytest.mark.usefixtures("ray_session")


def _tarjan(edge_list):
    adj: dict = {}
    verts = set()
    for s, d in edge_list:
        verts.add(s)
        verts.add(d)
        if s != d:
            adj.setdefault(s, []).append(d)
    sys.setrecursionlimit(100000)
    index: dict = {}
    low: dict = {}
    onstk: dict = {}
    stk: list = []
    out: dict = {}
    cnt = [0]

    def strong(v):
        index[v] = low[v] = cnt[0]
        cnt[0] += 1
        stk.append(v)
        onstk[v] = True
        for w in adj.get(v, []):
            if w not in index:
                strong(w)
                low[v] = min(low[v], low[w])
            elif onstk.get(w):
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            comp = []
            while True:
                w = stk.pop()
                onstk[w] = False
                comp.append(w)
                if w == v:
                    break
            m = min(comp)
            for w in comp:
                out[w] = m

    for v in sorted(verts):
        if v not in index:
            strong(v)
    return out


def _run(edge_list, blocks=3, **kw):
    df = pd.DataFrame(edge_list, columns=["src", "dst"]) \
        .astype("int64")
    kw.setdefault("num_buckets", 4)
    got = strongly_connected_components(
        rd.from_pandas(df).repartition(blocks), **kw)
    return dict(zip(got["vertex"], got["scc"]))


class TestScc:

    def test_bridged_two_cycles_and_tail(self):
        # 2-cycle -> 2-cycle -> DAG tail: exercises trim, two
        # color+mark rounds, and edge removal between rounds
        el = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4)]
        got = _run(el)
        assert got == _tarjan(el)
        assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4}

    def test_pure_dag_all_singletons(self):
        el = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
        got = _run(el)
        assert got == _tarjan(el)
        assert all(v == s for v, s in got.items())

    def test_self_loops_and_two_cycle(self):
        el = [(7, 7), (1, 2), (2, 1), (2, 3)]
        assert _run(el) == _tarjan(el)

    def test_random_matches_tarjan(self):
        rng = np.random.RandomState(4)
        el = list(zip(rng.randint(0, 25, 90).tolist(),
                      rng.randint(0, 25, 90).tolist()))
        got = _run(el)
        assert got == _tarjan(el)
        # dense digraph collapses to one giant SCC — the cheap case
        assert len(set(got.values())) == 1

    def test_partitioning_invariance(self):
        el = [(0, 1), (1, 0), (1, 2)]
        a = _run(el, blocks=1, num_buckets=4)
        b = _run(el, blocks=4, num_buckets=7)
        assert a == b == _tarjan(el)

    def test_empty(self):
        got = strongly_connected_components(
            pd.DataFrame({"src": [], "dst": []}).astype("int64"))
        assert len(got) == 0
        assert list(got.columns) == ["vertex", "scc"]
