"""PMAM tests: GMM/KMeans/PCA correctness, feature taps, pseudo-labels,
prototype-BCE step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformer4sed_tpu.pmam import (
    GaussianMixture,
    KMeans,
    PCA,
    PMAMConfig,
    extract_frame_features,
    frame_probs_to_tsv,
    make_pmam_step,
    prototype_predictions,
    sample_features,
)

KEY = jax.random.PRNGKey(0)


def blobs(n_per=500, d=8, centers=((0, 5), (5, 0), (-5, -5))):
    rng = np.random.RandomState(0)
    data = []
    for cx, cy in centers:
        mu = np.zeros(d)
        mu[0], mu[1] = cx, cy
        data.append(rng.randn(n_per, d) * 0.5 + mu)
    return np.concatenate(data).astype(np.float32)


class TestClustering:
    def test_kmeans_recovers_centers(self):
        data = blobs()
        km = KMeans(num_clusters=3, n_iter=25).fit(data)
        centers = km.centroids[np.argsort(km.centroids[:, 0])]
        np.testing.assert_allclose(centers[:, 0], [-5, 0, 5], atol=0.3)

    def test_gmm_full_covariance(self):
        data = blobs()
        gmm = GaussianMixture(num_components=3, covariance_type="full", n_iter=30).fit(data)
        probs = gmm.predict_proba(data)
        assert probs.shape == (len(data), 3)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
        # confident assignment on well-separated blobs
        assert (probs.max(axis=1) > 0.99).mean() > 0.95
        # each blob maps to one component
        labels = probs.argmax(axis=1)
        assert len(np.unique(labels[:500])) == 1
        assert len(np.unique(labels)) == 3

    def test_gmm_diag(self):
        data = blobs()
        gmm = GaussianMixture(num_components=3, covariance_type="diag", n_iter=30).fit(data)
        assert gmm.covariances.shape == (3, 8)
        assert (gmm.predict_proba(data).max(axis=1) > 0.9).mean() > 0.9

    def test_gmm_weights_sum(self):
        data = blobs()
        gmm = GaussianMixture(num_components=3, n_iter=10).fit(data)
        assert abs(gmm.weights.sum() - 1.0) < 1e-5

    def test_pca(self):
        rng = np.random.RandomState(1)
        base = rng.randn(1000, 2) @ np.array([[3.0, 0.0], [0.0, 0.2]])
        data = np.concatenate([base, np.zeros((1000, 6))], axis=1).astype(np.float32)
        pca = PCA(n_components=2)
        out = pca.fit_transform(data)
        assert out.shape == (1000, 2)
        # first component captures the high-variance direction
        assert out[:, 0].std() > out[:, 1].std() * 5


class TestFeatureTap:
    def test_sample_features_shape(self):
        feats = jnp.arange(100, dtype=jnp.float32).reshape(20, 5)
        out = sample_features(KEY, feats, downsample_rate=4)
        assert out.shape == (5, 5)

    def test_extract_from_decoder_block(self):
        from tests.test_train import tiny_model, tiny_frontend

        model = tiny_model()
        frontend = tiny_frontend()
        mel = frontend.normalize(frontend(jnp.zeros((2, 38081))))  # ~120 mel frames
        variables = model.init({"params": KEY}, mel)
        feats = extract_frame_features(
            model, variables, [mel, mel], feature_layer="transformer_0", downsample_rate=4
        )
        assert feats.ndim == 2 and feats.shape[1] == 32
        assert len(feats) == 2 * (2 * 120 // 4)  # 2 batches x (B*T_dec/ds); T_dec=120

    def test_extract_after_interpolate(self):
        from tests.test_train import tiny_model, tiny_frontend

        model = tiny_model()
        frontend = tiny_frontend()
        mel = frontend.normalize(frontend(jnp.zeros((1, 38081))))
        variables = model.init({"params": KEY}, mel)
        feats = extract_frame_features(
            model, variables, [mel], feature_layer="after_interpolate", downsample_rate=10
        )
        assert feats.shape == (12, 32)  # 1*120/10


class TestPseudoLabels:
    def test_tsv_roundtrip(self, tmp_path):
        import pandas as pd

        probs = np.random.RandomState(0).rand(50, 4).astype(np.float32)
        path = str(tmp_path / "clip.tsv")
        frame_probs_to_tsv(path, probs, label_sr=100.0)
        table = pd.read_csv(path, sep="\t")
        assert list(table.columns[:2]) == ["onset", "offset"]
        np.testing.assert_allclose(table.to_numpy()[:, 2:], probs, atol=1e-5)
        np.testing.assert_allclose(table["offset"] - table["onset"], 0.01, atol=1e-6)


class TestPrototypeStep:
    def test_prototype_predictions_range(self):
        logit = jnp.asarray(np.random.RandomState(0).randn(2, 10, 8).astype(np.float32))
        means = jnp.asarray(np.random.RandomState(1).randn(4, 8).astype(np.float32))
        pred = prototype_predictions(logit, means)
        assert pred.shape == (2, 10, 4)
        assert float(pred.min()) >= 0 and float(pred.max()) <= 1

    def test_pmam_step_runs(self):
        from tests.test_train import tiny_frontend, tiny_model
        from transformer4sed_tpu.train.mlm import MLMState

        model = tiny_model(mlm=True, mlm_dict={"mask_rate": 0.5, "block_width": 10, "out_dim": 32})
        frontend = tiny_frontend()
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 38081).astype(np.float32))
        mel = frontend.normalize(frontend(wav))
        variables = model.init({"params": KEY, "mlm": KEY}, mel)

        def model_apply(params, mel_in, train=False, rngs=None, **kw):
            return model.apply({"params": params}, mel_in, train=train, rngs=rngs, **kw)

        gmm_means = np.random.RandomState(2).randn(6, 32).astype(np.float32)
        tx = optax.adamw(1e-3)
        state = MLMState(params=variables["params"], opt_state=tx.init(variables["params"]), step=jnp.zeros((), jnp.int32))
        step = jax.jit(make_pmam_step(model_apply, frontend, tx, gmm_means, PMAMConfig(w_at=0.0)))
        labels = jnp.asarray((np.random.RandomState(3).rand(2, 6, 120)).astype(np.float32))
        state, metrics = step(state, {"wav": wav, "labels": labels}, KEY)
        assert np.isfinite(float(metrics["loss_total"]))
        assert int(state.step) == 1
