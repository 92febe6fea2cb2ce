"""Accelerator-native clustering for PMAM: GMM (EM), KMeans, PCA.

The reference fits a pycave GPU GaussianMixture (full covariance,
1.5M-row batches) or KMeans, optionally after PCA, over ~10^7 x 768
frame embeddings (``recipes/desed/pmam/gmm.py:40-79``). pycave is not
in this image; this module implements the same trio directly in JAX:

  * E and M steps are single jitted programs over data chunks, so the
    responsibilities/sufficient-statistics matmuls land on the MXU and
    memory stays bounded regardless of dataset size;
  * full or diagonal covariance (Cholesky-based log-likelihood,
    reg_covar jitter);
  * KMeans with k-means++ style seeding on a subsample;
  * PCA via the covariance eigendecomposition.

All three expose ``fit`` / ``predict_proba`` (or ``transform``) and a
``means`` attribute — the artifact PMAM consumes (``gmm_means.pt``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _chunks(data: np.ndarray, batch_size: int):
    for i in range(0, len(data), batch_size):
        yield data[i : i + batch_size]


class PCA:
    """Eigendecomposition PCA (sklearn-equivalent transform)."""

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.mean_: Optional[np.ndarray] = None
        self.components_: Optional[np.ndarray] = None

    def fit(self, data: np.ndarray, batch_size: int = 1_000_000) -> "PCA":
        d = data.shape[-1]
        total = len(data)
        mean = np.zeros(d, np.float64)
        for chunk in _chunks(data, batch_size):
            mean += np.asarray(chunk, np.float64).sum(0)
        mean /= total
        cov = np.zeros((d, d), np.float64)
        for chunk in _chunks(data, batch_size):
            c = np.asarray(chunk, np.float64) - mean
            cov += np.asarray(jnp.asarray(c).T @ jnp.asarray(c), np.float64)
        cov /= max(total - 1, 1)
        eigvals, eigvecs = np.linalg.eigh(cov)
        order = np.argsort(eigvals)[::-1][: self.n_components]
        self.mean_ = mean.astype(np.float32)
        self.components_ = eigvecs[:, order].T.astype(np.float32)  # [k, d]
        return self

    def transform(self, data: np.ndarray) -> np.ndarray:
        return (np.asarray(data) - self.mean_) @ self.components_.T

    def fit_transform(self, data: np.ndarray) -> np.ndarray:
        return self.fit(data).transform(data)


class KMeans:
    def __init__(self, num_clusters: int, n_iter: int = 50, seed: int = 0):
        self.num_clusters = num_clusters
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None

    def _init_centroids(self, data: np.ndarray) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        sub = data[rng.choice(len(data), size=min(len(data), 100_000), replace=False)]
        centroids = [sub[rng.integers(len(sub))]]
        for _ in range(self.num_clusters - 1):
            d2 = np.min(
                np.asarray(
                    jnp.sum((jnp.asarray(sub)[:, None] - jnp.asarray(np.stack(centroids))[None]) ** 2, -1)
                ),
                axis=1,
            )
            probs = d2 / d2.sum()
            centroids.append(sub[rng.choice(len(sub), p=probs)])
        return np.stack(centroids).astype(np.float32)

    def fit(self, data: np.ndarray, batch_size: int = 1_000_000) -> "KMeans":
        centroids = jnp.asarray(self._init_centroids(data))

        @jax.jit
        def assign_stats(chunk, cents):
            d2 = (
                jnp.sum(chunk ** 2, 1, keepdims=True)
                - 2 * chunk @ cents.T
                + jnp.sum(cents ** 2, 1)[None]
            )
            idx = jnp.argmin(d2, axis=1)
            one_hot = jax.nn.one_hot(idx, cents.shape[0], dtype=chunk.dtype)
            return one_hot.T @ chunk, one_hot.sum(0)

        for _ in range(self.n_iter):
            sums = jnp.zeros_like(centroids)
            counts = jnp.zeros((self.num_clusters,))
            for chunk in _chunks(data, batch_size):
                s, c = assign_stats(jnp.asarray(chunk, jnp.float32), centroids)
                sums += s
                counts += c
            centroids = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids)
        self.centroids = np.asarray(centroids)
        return self

    @property
    def means(self) -> np.ndarray:
        return self.centroids

    def predict(self, data: np.ndarray) -> np.ndarray:
        cents = jnp.asarray(self.centroids)
        d2 = (
            jnp.sum(jnp.asarray(data) ** 2, 1, keepdims=True)
            - 2 * jnp.asarray(data) @ cents.T
            + jnp.sum(cents ** 2, 1)[None]
        )
        return np.asarray(jnp.argmin(d2, axis=1))


class GaussianMixture:
    """EM Gaussian mixture with 'full' or 'diag' covariance."""

    def __init__(
        self,
        num_components: int,
        covariance_type: str = "full",
        n_iter: int = 50,
        reg_covar: float = 1e-6,
        seed: int = 0,
        kmeans_init: bool = True,
    ):
        assert covariance_type in ("full", "diag")
        self.k = num_components
        self.covariance_type = covariance_type
        self.n_iter = n_iter
        self.reg_covar = reg_covar
        self.seed = seed
        self.kmeans_init = kmeans_init
        self.means: Optional[np.ndarray] = None
        self.covariances: Optional[np.ndarray] = None
        self.weights: Optional[np.ndarray] = None

    # -- log responsibilities ---------------------------------------------------
    def _log_prob_fn(self):
        cov_type = self.covariance_type

        def log_prob(chunk, means, covs, log_weights):
            d = chunk.shape[-1]
            if cov_type == "diag":
                diff = chunk[:, None] - means[None]  # [N, K, D]
                inv = 1.0 / covs  # [K, D]
                maha = jnp.sum(diff * diff * inv[None], axis=-1)
                logdet = jnp.sum(jnp.log(covs), axis=-1)
            else:
                chol = jnp.linalg.cholesky(covs)  # [K, D, D]
                diff = chunk[:, None] - means[None]  # [N, K, D]
                sol = jax.vmap(
                    lambda l, x: jax.scipy.linalg.solve_triangular(l, x.T, lower=True),
                    in_axes=(0, 1),
                )(chol, diff)  # [K, D, N]
                maha = jnp.sum(sol ** 2, axis=1).T  # [N, K]
                logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=-1)
            return log_weights[None] - 0.5 * (maha + logdet + d * jnp.log(2 * jnp.pi))

        return log_prob

    def fit(self, data: np.ndarray, batch_size: int = 1_000_000) -> "GaussianMixture":
        data = np.asarray(data, np.float32)
        n, d = data.shape
        if self.kmeans_init:
            km = KMeans(self.k, n_iter=10, seed=self.seed).fit(
                data[np.random.default_rng(self.seed).choice(n, size=min(n, 200_000), replace=False)]
            )
            means = jnp.asarray(km.centroids)
        else:
            rng = np.random.default_rng(self.seed)
            means = jnp.asarray(data[rng.choice(n, size=self.k, replace=False)])
        var0 = np.var(data[: min(n, 100_000)], axis=0) + self.reg_covar
        if self.covariance_type == "diag":
            covs = jnp.tile(jnp.asarray(var0)[None], (self.k, 1))
        else:
            covs = jnp.tile(jnp.diag(jnp.asarray(var0))[None], (self.k, 1, 1))
        weights = jnp.full((self.k,), 1.0 / self.k)

        log_prob = self._log_prob_fn()

        @jax.jit
        def e_stats(chunk, means, covs, log_weights):
            lp = log_prob(chunk, means, covs, log_weights)
            log_norm = jax.scipy.special.logsumexp(lp, axis=1, keepdims=True)
            resp = jnp.exp(lp - log_norm)  # [N, K]
            nk = resp.sum(0)
            mean_stat = resp.T @ chunk  # [K, D]
            if self.covariance_type == "diag":
                cov_stat = resp.T @ (chunk ** 2)
            else:
                cov_stat = jnp.einsum("nk,ni,nj->kij", resp, chunk, chunk)
            return nk, mean_stat, cov_stat, jnp.sum(log_norm)

        for _ in range(self.n_iter):
            nk = jnp.zeros((self.k,))
            mean_stat = jnp.zeros((self.k, d))
            cov_stat = (
                jnp.zeros((self.k, d))
                if self.covariance_type == "diag"
                else jnp.zeros((self.k, d, d))
            )
            for chunk in _chunks(data, batch_size):
                a, b, c, _ = e_stats(jnp.asarray(chunk), means, covs, jnp.log(weights))
                nk += a
                mean_stat += b
                cov_stat += c
            nk = jnp.maximum(nk, 1e-6)
            means = mean_stat / nk[:, None]
            if self.covariance_type == "diag":
                covs = cov_stat / nk[:, None] - means ** 2 + self.reg_covar
                covs = jnp.maximum(covs, self.reg_covar)
            else:
                covs = cov_stat / nk[:, None, None] - jnp.einsum("ki,kj->kij", means, means)
                covs = covs + self.reg_covar * jnp.eye(d)[None]
            weights = nk / jnp.sum(nk)

        self.means = np.asarray(means)
        self.covariances = np.asarray(covs)
        self.weights = np.asarray(weights)
        return self

    def predict_proba(self, data: np.ndarray, batch_size: int = 1_000_000) -> np.ndarray:
        log_prob = self._log_prob_fn()

        @jax.jit
        def probs(chunk):
            lp = log_prob(
                chunk,
                jnp.asarray(self.means),
                jnp.asarray(self.covariances),
                jnp.log(jnp.asarray(self.weights)),
            )
            return jax.nn.softmax(lp, axis=1)

        return np.concatenate(
            [np.asarray(probs(jnp.asarray(c, jnp.float32))) for c in _chunks(np.asarray(data), batch_size)]
        )

    def predict(self, data: np.ndarray) -> np.ndarray:
        return self.predict_proba(data).argmax(axis=1)
