"""In-context pretraining document ordering (vectors.incontext_order).

Clustered greedy nearest-neighbor chaining (Shi et al. '23): related
documents end up adjacent in the (cluster, pos) concatenation order.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines import vectors as V

SF = "/root/testdata/sf0.001"


def _toy(vectors, ids=None):
    ids = ids if ids is not None else list(range(len(vectors)))
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.asarray(ids, dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float64)
                      for v in vectors]}))


@pytest.mark.usefixtures("ray_session")
class TestInContextOrder:
    def test_chain_recovers_a_line(self):
        # points on a line, fed in scrambled id order: the greedy
        # chain from the smallest vec_id must walk the line monotonically
        xs = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
        ds = _toy([[x, 0.0] for x in xs])
        out = (V.incontext_order_ds(ds, np.array([[2.5, 0.0]]))
               .to_pandas().sort_values("pos"))
        assert out["vec_id"].tolist() == [0, 1, 2, 3, 4, 5]

    def test_permutation_and_contiguity(self):
        out = V.incontext_order(SF, k=4, iters=3)
        assert sorted(out["vec_id"]) == list(range(len(out)))
        # one row per doc; positions within a cluster are 0..m-1
        for _, g in out.groupby("cluster"):
            assert sorted(g["pos"]) == list(range(len(g)))

    def test_adjacent_similarity_beats_shuffled(self):
        import pyarrow.parquet as pq
        emb = pq.read_table(f"{SF}/embeddings.parquet",
                            columns=["vec_id", "embedding"]).to_pandas()
        m = np.stack(emb.sort_values("vec_id")["embedding"]
                     .map(np.asarray).to_list())
        out = V.incontext_order(SF, k=4, iters=3)

        def mean_adjacent_d2(order):
            v = m[order]
            return float(np.mean(np.sum(np.diff(v, axis=0) ** 2,
                                        axis=1)))

        chained = []
        for _, g in out.sort_values(["cluster", "pos"]).groupby(
                "cluster", sort=True):
            chained.extend(g.sort_values("pos")["vec_id"].tolist())
        rng = np.random.RandomState(7)
        shuffled = rng.permutation(len(m))
        assert mean_adjacent_d2(np.asarray(chained)) \
            < mean_adjacent_d2(shuffled)

    def test_deterministic(self):
        a = V.incontext_order(SF, k=4, iters=3)
        b = V.incontext_order(SF, k=4, iters=3)
        assert a.equals(b)

    def test_tie_breaks_to_smallest_id(self):
        # two duplicate points: after visiting the first, the chain
        # must pick the duplicate with the SMALLER id next
        ds = _toy([[0.0], [5.0], [5.0], [0.1]], ids=[10, 20, 30, 11])
        out = (V.incontext_order_ds(ds, np.array([[0.0]]))
               .to_pandas().sort_values("pos"))
        assert out["vec_id"].tolist() == [10, 11, 20, 30]
