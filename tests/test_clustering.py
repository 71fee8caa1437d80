"""Distributed k-means: the Lloyd iteration is golden-tested against a
single-process reference started from the SAME init (identical
empty-cluster rule), the assignment pass against a naive nearest
computation, and the end-to-end fit against known well-separated
blobs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines import clustering as C

pytestmark = pytest.mark.usefixtures("ray_session")


def _blobs(n_per=200, k=3, d=6, seed=0, spread=0.4):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-10, 10, (k, d))
    X = np.vstack([rng.normal(c, spread, (n_per, d)) for c in centers])
    labels = np.repeat(np.arange(k), n_per)
    ids = np.arange(len(X), dtype=np.int64) * 5 + 3  # non-contiguous
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [r.tolist() for r in X],
                       "blob": labels})
    return df, X, labels


def _ref_lloyd(X, init, n_iter, tol):
    cents = init.copy().astype(np.float64)
    hist = []
    it = 0
    for it in range(1, n_iter + 1):
        d2 = ((X[:, None, :] - cents[None]) ** 2).sum(-1)
        idx = d2.argmin(1)
        hist.append(float(d2[np.arange(len(X)), idx].sum()))
        new = cents.copy()
        for j in range(len(cents)):
            m = idx == j
            if m.any():
                new[j] = X[m].mean(0)
        shift = float(np.sqrt(((new - cents) ** 2).sum(1)).max())
        cents = new
        if shift < tol:
            break
    return cents, hist, it


class TestKMeans:

    def test_lloyd_matches_reference_from_same_init(self):
        df, X, _ = _blobs(seed=4)
        ds = rd.from_pandas(df).repartition(7)
        rng = np.random.RandomState(1)
        init = X[rng.choice(len(X), 4, replace=False)].copy()
        got = C.kmeans_fit(ds, 4, init=init, n_iter=8, tol=1e-9)
        want_c, want_h, want_it = _ref_lloyd(X, init, 8, 1e-9)
        assert got["n_iter"] == want_it
        np.testing.assert_allclose(got["inertia"], want_h, rtol=1e-9)
        np.testing.assert_allclose(got["centroids"], want_c, rtol=1e-9)

    def test_assign_matches_naive(self):
        df, X, _ = _blobs(n_per=80, seed=5)
        cents = np.random.RandomState(2).uniform(-10, 10, (5, X.shape[1]))
        got = (C.kmeans_assign(rd.from_pandas(df).repartition(4), cents)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        d2 = ((X[:, None, :] - cents[None]) ** 2).sum(-1)
        order = np.argsort(df["vec_id"].to_numpy())
        assert got["cluster"].tolist() == d2.argmin(1)[order].tolist()
        np.testing.assert_allclose(
            got["sq_dist"].to_numpy(), d2.min(1)[order], rtol=1e-9)

    def test_recovers_separated_blobs(self):
        df, X, labels = _blobs(n_per=150, k=3, seed=7)
        ds = rd.from_pandas(df).repartition(5)
        fit = C.kmeans_fit(ds, 3, seed=11, n_iter=15)
        # inertia never increases
        h = fit["inertia"]
        assert all(b <= a + 1e-9 for a, b in zip(h, h[1:]))
        asg = (C.kmeans_assign(ds, fit["centroids"]).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        asg["blob"] = labels[np.argsort(
            np.argsort(df["vec_id"].to_numpy()))][
                np.argsort(df["vec_id"].to_numpy())]
        # each blob lands entirely in one cluster, all distinct
        got_of_blob = {}
        order = np.argsort(df["vec_id"].to_numpy())
        blob_sorted = labels[order]
        for b in range(3):
            cl = asg.loc[blob_sorted == b, "cluster"].unique()
            assert len(cl) == 1
            got_of_blob[b] = cl[0]
        assert len(set(got_of_blob.values())) == 3
        # centroids sit on blob means
        for b, cl in got_of_blob.items():
            np.testing.assert_allclose(
                fit["centroids"][cl], X[labels == b].mean(0), atol=0.15)

    def test_deterministic_in_seed(self):
        df, _, _ = _blobs(n_per=60, seed=9)
        ds = rd.from_pandas(df).repartition(3)
        # same partitioning + same seed -> bit-identical
        a = C.kmeans_fit(ds, 3, seed=5, n_iter=6)
        a2 = C.kmeans_fit(ds, 3, seed=5, n_iter=6)
        np.testing.assert_array_equal(a["centroids"], a2["centroids"])
        assert a["inertia"] == a2["inertia"]
        # different partitioning: candidate set and assignments are
        # hash-determined; float sums only agree to fp reassociation
        b = C.kmeans_fit(ds.repartition(8), 3, seed=5, n_iter=6)
        np.testing.assert_allclose(a["centroids"], b["centroids"],
                                   rtol=1e-12)
        asg_a = C.kmeans_assign(ds, a["centroids"]).to_pandas() \
            .sort_values("vec_id")["cluster"].tolist()
        asg_b = C.kmeans_assign(ds, b["centroids"]).to_pandas() \
            .sort_values("vec_id")["cluster"].tolist()
        assert asg_a == asg_b

    def test_init_raises_when_k_exceeds_candidates(self):
        df = pd.DataFrame({"vec_id": [1, 2],
                           "embedding": [[0.0, 0.0], [1.0, 1.0]]})
        with pytest.raises(ValueError, match="distinct candidates"):
            C.kmeans_init(rd.from_pandas(df), 10)

    def test_pipeline_summary(self, tmp_path):
        df, _, _ = _blobs(n_per=100, k=3, seed=13)
        import pyarrow as pa
        import pyarrow.parquet as pq
        pq.write_table(pa.Table.from_pandas(
            df[["vec_id", "embedding"]]), str(tmp_path / "embeddings.parquet"))
        out = C.kmeans_pipeline(str(tmp_path), k=3, n_iter=8, seed=3)
        assert out["cluster"].tolist() == [0, 1, 2]
        assert out["n"].sum() == len(df)
        assert (out["mean_sq_dist"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
class TestKMeansParRounds:
    def test_rounds_1_is_usable(self):
        """Regression: phi seeded at inf made round 1 sample nothing,
        so rounds=1 always raised 'only 1 distinct candidates'."""
        import ray.data as rd
        from osm_sidewalkreator_ray.pipelines.clustering import \
            kmeans_init
        rng = np.random.RandomState(0)
        pts = np.vstack([rng.normal(0, 0.1, (40, 4)),
                         rng.normal(5, 0.1, (40, 4))])
        df = pd.DataFrame({
            "vec_id": np.arange(80, dtype=np.int64),
            "embedding": [r for r in pts]})
        cents = kmeans_init(rd.from_pandas(df), k=2, rounds=1,
                            oversample=8.0)
        assert cents.shape == (2, 4)


def test_u01_uniform_on_sequential_ids():
    """Regression: the half fmix64 finalizer clustered sequential ids
    into u ~ [0.43, 0.67], so probabilities below ~0.43 never fired."""
    from osm_sidewalkreator_ray.pipelines.clustering import _u01
    u = _u01(np.arange(10000, dtype=np.int64), 1, 0)
    hist, _ = np.histogram(u, bins=10, range=(0.0, 1.0))
    assert hist.min() > 800 and hist.max() < 1200
    assert u.min() < 0.01 and u.max() > 0.99


def test_poisson_counts_match_poisson1():
    from osm_sidewalkreator_ray.pipelines.textops import \
        _poisson_counts
    c = _poisson_counts(np.arange(100000, dtype=np.int64), 1, 42)
    h = np.bincount(c, minlength=6) / len(c)
    expect = np.exp(-1.0) * np.array([1, 1, 1 / 2, 1 / 6, 1 / 24,
                                      1 / 120])
    assert np.allclose(h[:6], expect, atol=0.01)
