"""k-core decomposition: the distributed h-index fixpoint vs a
single-process Matula-Beck peeling reference, plus known-structure
cases (cliques, paths, stars, self-loops)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.graph import coreness

pytestmark = pytest.mark.usefixtures("ray_session")


def _coreness_reference(edges: pd.DataFrame) -> dict[int, int]:
    """Matula-Beck peeling: repeatedly delete the min-degree vertex;
    core(v) = the running max of the min degree at deletion time."""
    adj: dict[int, set[int]] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        s, d = int(s), int(d)
        adj.setdefault(s, set())
        adj.setdefault(d, set())
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    core: dict[int, int] = {}
    k = 0
    live = dict(adj)
    while live:
        v = min(live, key=lambda u: (len(live[u]), u))
        k = max(k, len(live[v]))
        core[v] = k
        for u in live[v]:
            live[u].discard(v)
        del live[v]
    return core


def _run(edges: pd.DataFrame, nparts=4) -> pd.DataFrame:
    return coreness(rd.from_pandas(edges).repartition(nparts))


def _assert_matches_reference(edges: pd.DataFrame):
    got = _run(edges)
    want = _coreness_reference(edges)
    assert dict(zip(got["vertex"], got["coreness"])) == want


class TestCoreness:
    def test_clique_with_tail(self):
        # K5 (coreness 4) with a path hanging off it (coreness 1)
        k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        tail = [(4, 10), (10, 11), (11, 12)]
        edges = pd.DataFrame(k5 + tail, columns=["src", "dst"])
        got = _run(edges)
        by = dict(zip(got["vertex"], got["coreness"]))
        assert all(by[v] == 4 for v in range(5))
        assert by[10] == by[11] == by[12] == 1
        _assert_matches_reference(edges)

    def test_star_and_path_are_one_core(self):
        star = [(0, i) for i in range(1, 9)]
        path = [(100 + i, 101 + i) for i in range(6)]
        edges = pd.DataFrame(star + path, columns=["src", "dst"])
        got = _run(edges)
        assert (got["coreness"] == 1).all()

    @pytest.mark.parametrize("seed,n,m", [(3, 60, 200), (7, 80, 400),
                                          (11, 40, 90)])
    def test_random_graphs_match_peeling_reference(self, seed, n, m):
        rng = np.random.RandomState(seed)
        edges = pd.DataFrame({
            "src": rng.randint(0, n, m).astype(np.int64),
            "dst": rng.randint(0, n, m).astype(np.int64)})
        _assert_matches_reference(edges)

    def test_duplicate_and_reverse_edges_ignored(self):
        tri = pd.DataFrame({"src": [1, 2, 3, 2, 1, 1],
                            "dst": [2, 3, 1, 1, 2, 3]})
        got = _run(tri, nparts=2)
        assert (got["coreness"] == 2).all()

    def test_self_loop_only_vertex_is_zero_core(self):
        edges = pd.DataFrame({"src": [1, 2, 99], "dst": [2, 3, 99]})
        got = _run(edges, nparts=2)
        by = dict(zip(got["vertex"], got["coreness"]))
        assert by[99] == 0
        assert by[1] == by[2] == by[3] == 1

    def test_all_self_loops(self):
        edges = pd.DataFrame({"src": [5, 6], "dst": [5, 6]})
        got = _run(edges, nparts=2)
        assert got["vertex"].tolist() == [5, 6]
        assert got["coreness"].tolist() == [0, 0]
