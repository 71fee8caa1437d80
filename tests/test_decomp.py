"""Distributed PCA vs an in-memory numpy oracle: covariance/eigen
agreement, projection equality, whitening, reconstruction error,
partitioning invariance, and the embeddings-table pipeline."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from osm_sidewalkreator_ray.pipelines.decomp import (
    _canon_signs, pca_fit, pca_pipeline, pca_transform,
    reconstruction_mse)

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _data(n=200, d=8, seed=0):
    rng = np.random.RandomState(seed)
    # anisotropic so the spectrum has clear gaps (stable eigvecs)
    scales = np.linspace(5.0, 0.5, d)
    x = rng.randn(n, d) * scales + rng.randn(d) * 3
    return x


def _ds(x, blocks=5):
    df = pd.DataFrame({"vec_id": np.arange(len(x), dtype=np.int64),
                       "embedding": list(x)})
    return rd.from_pandas(df).repartition(blocks)


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    evals = evals[::-1]
    comps = _canon_signs(evecs[:, ::-1].T)
    return mean, comps[:k], evals[:k], evals.sum()


class TestPcaFit:

    def test_matches_numpy_oracle(self):
        x = _data()
        model = pca_fit(_ds(x), k=4)
        mean, comps, evals, total = _numpy_pca(x, 4)
        np.testing.assert_allclose(model["mean"], mean, atol=1e-10)
        np.testing.assert_allclose(model["explained_variance"],
                                   evals, rtol=1e-9)
        np.testing.assert_allclose(model["components"], comps,
                                   atol=1e-8)
        np.testing.assert_allclose(
            model["explained_variance_ratio"], evals / total,
            rtol=1e-9)
        assert model["n"] == len(x)

    def test_partitioning_invariance(self):
        x = _data(seed=3)
        a = pca_fit(_ds(x, blocks=1), k=3)
        b = pca_fit(_ds(x, blocks=11), k=3)
        np.testing.assert_allclose(a["components"], b["components"],
                                   atol=1e-9)
        np.testing.assert_allclose(a["explained_variance"],
                                   b["explained_variance"], rtol=1e-9)

    def test_uncentered(self):
        x = _data(seed=5)
        model = pca_fit(_ds(x), k=2, center=False)
        evals, evecs = np.linalg.eigh(x.T @ x / (len(x) - 1))
        np.testing.assert_allclose(
            model["components"],
            _canon_signs(evecs[:, ::-1].T)[:2], atol=1e-8)
        assert np.allclose(model["mean"], 0.0)

    def test_k_bounds_and_empty(self):
        x = _data(n=20)
        with pytest.raises(ValueError):
            pca_fit(_ds(x), k=0)
        with pytest.raises(ValueError):
            pca_fit(_ds(x), k=9)
        with pytest.raises(ValueError):
            pca_fit(_ds(x[:0], blocks=1), k=1)


class TestPcaTransform:

    def test_projection_equals_numpy(self):
        x = _data(seed=7)
        model = pca_fit(_ds(x), k=3)
        out = pca_transform(_ds(x), model).to_pandas() \
            .sort_values("vec_id")
        got = np.stack(out["pc"].to_numpy())
        want = (x - model["mean"]) @ model["components"].T
        np.testing.assert_allclose(got, want, atol=1e-9)
        assert "embedding" not in out.columns

    def test_whiten_unit_variance(self):
        x = _data(n=500, seed=9)
        model = pca_fit(_ds(x), k=4)
        out = pca_transform(_ds(x), model, whiten=True).to_pandas()
        p = np.stack(out["pc"].to_numpy())
        np.testing.assert_allclose(p.var(axis=0, ddof=1),
                                   np.ones(4), rtol=1e-6)

    def test_reconstruction_mse(self):
        x = _data(seed=11)
        full = pca_fit(_ds(x), k=8)
        assert reconstruction_mse(_ds(x), full) < 1e-18
        rank2 = pca_fit(_ds(x), k=2)
        xc = x - rank2["mean"]
        r = xc - (xc @ rank2["components"].T) @ rank2["components"]
        want = float((r * r).sum()) / len(x)
        got = reconstruction_mse(_ds(x), rank2)
        np.testing.assert_allclose(got, want, rtol=1e-9)


class TestPipeline:

    def test_embeddings_table(self):
        out = pca_pipeline(SF, k=8)
        assert list(out.columns) == ["vec_id", "pc"]
        assert len(out) == 500
        assert out["vec_id"].is_monotonic_increasing
        assert all(len(p) == 8 for p in out["pc"])
        # scores must reproduce the in-memory oracle end to end
        df = pd.read_parquet(f"{SF}/embeddings.parquet")
        x = np.stack(df.sort_values("vec_id")["embedding"]
                     .to_numpy()).astype(np.float64)
        mean, comps, _, _ = _numpy_pca(x, 8)
        np.testing.assert_allclose(
            np.stack(out["pc"].to_numpy()),
            (x - mean) @ comps.T, atol=1e-7)


class TestRandomProjection:

    def test_shape_and_determinism(self):
        from osm_sidewalkreator_ray.pipelines.decomp import (
            random_projection_ds)
        x = _data(n=100, d=8, seed=13)
        a = random_projection_ds(_ds(x, 1), 4, seed=3).to_pandas() \
            .sort_values("vec_id")
        b = random_projection_ds(_ds(x, 7), 4, seed=3).to_pandas() \
            .sort_values("vec_id")
        pa_ = np.stack(a["rp"].to_numpy())
        pb = np.stack(b["rp"].to_numpy())
        assert pa_.shape == (100, 4)
        np.testing.assert_allclose(pa_, pb, atol=1e-12)
        assert "embedding" not in a.columns

    def test_distance_preservation(self):
        from osm_sidewalkreator_ray.pipelines.decomp import (
            random_projection_ds)
        rng = np.random.RandomState(0)
        x = rng.randn(60, 64)
        out = random_projection_ds(_ds(x, 3), 32, seed=1) \
            .to_pandas().sort_values("vec_id")
        p = np.stack(out["rp"].to_numpy())
        # JL: squared norms concentrate around the originals
        r = np.linalg.norm(p, axis=1) / np.linalg.norm(x, axis=1)
        assert 0.6 < r.min() and r.max() < 1.5
        assert abs(np.median(r) - 1.0) < 0.15
