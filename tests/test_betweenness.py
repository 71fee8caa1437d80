"""Batched Brandes betweenness / multi-source BFS / harmonic
closeness vs a local exact reference: path counts, exact
betweenness on structured and random graphs, directed semantics,
the sampled estimator, and harmonic sums."""

from collections import deque

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.graph import (
    betweenness_centrality, harmonic_closeness, multi_source_bfs)

pytestmark = pytest.mark.usefixtures("ray_session")


def _brandes(edge_list, directed=False):
    adj: dict = {}
    verts = set()
    for s, d in edge_list:
        verts.add(s)
        verts.add(d)
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    B = {v: 0.0 for v in verts}
    for s in verts:
        S = []
        P = {v: [] for v in verts}
        sig = {v: 0 for v in verts}
        sig[s] = 1
        d = {v: -1 for v in verts}
        d[s] = 0
        Q = deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in adj.get(v, ()):
                if d[w] < 0:
                    d[w] = d[v] + 1
                    Q.append(w)
                if d[w] == d[v] + 1:
                    sig[w] += sig[v]
                    P[w].append(v)
        delta = {v: 0.0 for v in verts}
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sig[v] / sig[w] * (1 + delta[w])
            if w != s:
                B[w] += delta[w]
    if not directed:
        for v in B:
            B[v] /= 2
    return B


def _run_exact(edge_list, directed=False, blocks=3):
    df = pd.DataFrame(edge_list, columns=["src", "dst"]) \
        .astype("int64")
    verts = sorted({x for e in edge_list for x in e})
    got = betweenness_centrality(
        rd.from_pandas(df).repartition(blocks), sources=verts,
        directed=directed, num_buckets=4)
    return dict(zip(got["vertex"], got["betweenness"]))


class TestBfsSigma:

    def test_diamond_path_counts(self):
        el = [(0, 1), (0, 2), (1, 3), (2, 3)]
        bfs = multi_source_bfs(
            pd.DataFrame(el, columns=["src", "dst"]).astype("int64"),
            [0], num_buckets=4)
        assert dict(zip(bfs["vertex"], bfs["sigma"])) \
            == {0: 1, 1: 1, 2: 1, 3: 2}
        assert dict(zip(bfs["vertex"], bfs["dist"])) \
            == {0: 0, 1: 1, 2: 1, 3: 2}

    def test_multi_source_and_unreachable(self):
        el = [(0, 1), (2, 3)]
        bfs = multi_source_bfs(
            pd.DataFrame(el, columns=["src", "dst"]).astype("int64"),
            [0, 2], directed=True, num_buckets=4)
        pairs = set(zip(bfs["source"], bfs["vertex"]))
        assert pairs == {(0, 0), (0, 1), (2, 2), (2, 3)}


class TestBetweenness:

    def test_path_and_star(self):
        el = [(0, 1), (1, 2), (2, 3)]
        assert _run_exact(el) == pytest.approx(_brandes(el))
        star = [(0, i) for i in range(1, 6)]
        got = _run_exact(star)
        assert got == pytest.approx(_brandes(star))
        assert got[0] == pytest.approx(10.0)  # C(5,2)

    def test_random_graph_matches_brandes(self):
        rng = np.random.RandomState(7)
        el = list({(int(a), int(b)) for a, b in
                   zip(rng.randint(0, 18, 50),
                       rng.randint(0, 18, 50)) if a != b})
        assert _run_exact(el) == pytest.approx(_brandes(el),
                                               abs=1e-9)

    def test_directed(self):
        el = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
        got = _run_exact(el, directed=True)
        assert got == pytest.approx(_brandes(el, directed=True))

    def test_sampled_scaling(self):
        # with k_sources == n the n/k scale is 1 and the result is
        # exact regardless of which vertices the hash sample picked
        el = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
        df = pd.DataFrame(el, columns=["src", "dst"]).astype("int64")
        got = betweenness_centrality(rd.from_pandas(df),
                                     k_sources=4, num_buckets=4)
        want = _brandes(el)
        assert dict(zip(got["vertex"], got["betweenness"])) \
            == pytest.approx(want)


class TestHarmonic:

    def test_path_exact(self):
        el = [(0, 1), (1, 2), (2, 3)]
        got = harmonic_closeness(
            pd.DataFrame(el, columns=["src", "dst"]).astype("int64"),
            sources=[0, 1, 2, 3], num_buckets=4)
        want = {0: 1 + 0.5 + 1 / 3, 1: 2.5, 2: 2.5,
                3: 1 + 0.5 + 1 / 3}
        assert dict(zip(got["vertex"], got["harmonic"])) \
            == pytest.approx(want)

    def test_sampled_scale_full_set(self):
        el = [(0, 1), (1, 2), (2, 0)]
        got = harmonic_closeness(
            pd.DataFrame(el, columns=["src", "dst"]).astype("int64"),
            k_sources=3, num_buckets=4)
        assert dict(zip(got["vertex"], got["harmonic"])) \
            == pytest.approx({0: 2.0, 1: 2.0, 2: 2.0})


class TestDiameter:

    def test_path_exact(self):
        from osm_sidewalkreator_ray.functions.graph import (
            approx_diameter)
        el = [(i, i + 1) for i in range(6)]
        got = approx_diameter(
            pd.DataFrame(el, columns=["src", "dst"]).astype("int64"),
            num_buckets=4)
        # double sweep is exact on trees
        assert got["diameter_lb"] == 6

    def test_cycle_lower_bound(self):
        from osm_sidewalkreator_ray.functions.graph import (
            approx_diameter)
        el = [(i, (i + 1) % 8) for i in range(8)]
        got = approx_diameter(
            pd.DataFrame(el, columns=["src", "dst"]).astype("int64"),
            num_buckets=4)
        assert got["diameter_lb"] == 4  # true diameter of C8

    def test_empty(self):
        from osm_sidewalkreator_ray.functions.graph import (
            approx_diameter)
        got = approx_diameter(
            pd.DataFrame({"src": [], "dst": []}).astype("int64"))
        assert got["diameter_lb"] == -1


@pytest.mark.usefixtures("ray_session")
def test_harmonic_emits_zero_rows_for_unreachable():
    """Regression: vertices unreachable from every source were absent
    from the output instead of carrying harmonic=0 (row-set contract
    of betweenness_centrality)."""
    # two disjoint components; sources restricted to the first
    edges = pd.DataFrame({"src": [0, 1, 10, 11],
                          "dst": [1, 2, 11, 12]})
    got = harmonic_closeness(edges, sources=[0])
    assert got["vertex"].tolist() == [0, 1, 2, 10, 11, 12]
    zeros = got.set_index("vertex")["harmonic"]
    assert zeros[10] == 0.0 and zeros[11] == 0.0 and zeros[12] == 0.0
    assert zeros[1] > 0.0
