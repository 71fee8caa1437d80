"""HITS hubs/authorities vs a local dense power-iteration reference
with the same L1 half-step normalization, plus structural checks."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.functions.graph import hits

pytestmark = pytest.mark.usefixtures("ray_session")


def _local_hits(edges, iters=20):
    e = pd.DataFrame(edges, columns=["src", "dst"]).drop_duplicates()
    verts = np.unique(np.concatenate([e["src"], e["dst"]]))
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for s, d in e.itertuples(index=False):
        A[idx[s], idx[d]] = 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    return verts, h, a


def _run(edges, iters=20):
    df = pd.DataFrame(edges, columns=["src", "dst"])
    return hits(rd.from_pandas(df).repartition(4), iters=iters)


class TestHits:

    def test_equals_local_reference(self):
        rng = np.random.RandomState(7)
        edges = list(zip(rng.randint(0, 40, 300).tolist(),
                         rng.randint(0, 40, 300).tolist()))
        got = _run(edges, iters=8)
        verts, h, a = _local_hits(edges, iters=8)
        assert got["vertex"].tolist() == verts.tolist()
        np.testing.assert_allclose(got["hub"], h, rtol=1e-9)
        np.testing.assert_allclose(got["authority"], a, rtol=1e-9)

    def test_partitioning_invariance(self):
        rng = np.random.RandomState(11)
        edges = list(zip(rng.randint(0, 25, 120).tolist(),
                         rng.randint(0, 25, 120).tolist()))
        df = pd.DataFrame(edges, columns=["src", "dst"])
        one = hits(rd.from_pandas(df).repartition(1), iters=8)
        many = hits(rd.from_pandas(df).repartition(9), iters=8)
        np.testing.assert_allclose(one["hub"], many["hub"], rtol=1e-12)
        np.testing.assert_allclose(one["authority"],
                                   many["authority"], rtol=1e-12)

    def test_in_star_center_is_the_authority(self):
        # 1..5 -> 0: center takes ALL authority, leaves all hub mass
        got = _run([(i, 0) for i in range(1, 6)], iters=3)
        center = got.loc[got["vertex"] == 0].iloc[0]
        leaves = got.loc[got["vertex"] != 0]
        np.testing.assert_allclose(center["authority"], 1.0)
        np.testing.assert_allclose(center["hub"], 0.0)
        np.testing.assert_allclose(leaves["hub"], 0.2)
        np.testing.assert_allclose(leaves["authority"], 0.0)

    def test_duplicate_edges_do_not_double_count(self):
        base = [(1, 2), (3, 2), (3, 4)]
        got = _run(base, iters=4)
        dup = _run(base + base + [(1, 2)], iters=4)
        np.testing.assert_allclose(got["hub"], dup["hub"], rtol=1e-12)
        np.testing.assert_allclose(got["authority"], dup["authority"],
                                   rtol=1e-12)

    def test_self_loop_kept(self):
        verts, h, a = _local_hits([(0, 0), (0, 1), (2, 1)], iters=5)
        got = _run([(0, 0), (0, 1), (2, 1)], iters=5)
        np.testing.assert_allclose(got["hub"], h, rtol=1e-9)
        np.testing.assert_allclose(got["authority"], a, rtol=1e-9)

    def test_empty_edges(self):
        got = hits(pd.DataFrame({"src": [], "dst": []}).astype("int64"))
        assert len(got) == 0
        assert list(got.columns) == ["vertex", "hub", "authority"]
