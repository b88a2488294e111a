"""Gaussian-mixture latent prior.

The reference ships a pretrained sklearn GaussianMixture over train-set
latents (data/pretrained_gmm.pkl: 10 components, full covariance, 18-dim)
used for the paper's GMM-latent conditional sampling. Here: a plain-JAX
GMM with sampling + log-density, a loader for the shipped pickle, and a
numpy EM fitter so new priors can be trained without sklearn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GMM:
    weights: jnp.ndarray        # [M]
    means: jnp.ndarray          # [M, D]
    covariances: jnp.ndarray    # [M, D, D]
    chols: jnp.ndarray          # [M, D, D] cholesky factors

    @classmethod
    def create(cls, weights, means, covariances) -> "GMM":
        cov = np.asarray(covariances, dtype=np.float64)
        chols = np.linalg.cholesky(cov)
        return cls(
            weights=jnp.asarray(weights, jnp.float32),
            means=jnp.asarray(means, jnp.float32),
            covariances=jnp.asarray(cov, jnp.float32),
            chols=jnp.asarray(chols, jnp.float32),
        )

    @classmethod
    def load_pretrained(cls) -> "GMM":
        from cape_tpu.meshops.assets import load_gmm

        d = load_gmm()
        return cls.create(d["weights"], d["means"], d["covariances"])

    @classmethod
    def from_npz(cls, path: str) -> "GMM":
        """Load a prior written by tools.fit_latent_gmm — the refit path
        for models whose nz differs from the shipped 18-dim asset (e.g.
        the nz=64 flagship; VERDICT r3 item 5)."""
        d = np.load(path)
        return cls.create(d["weights"], d["means"], d["covariances"])

    def sample(self, rng: jax.Array, n: int) -> jnp.ndarray:
        """Draw n latent samples: component ~ Categorical(w), z ~ N(mu_k, S_k)."""
        k_comp, k_eps = jax.random.split(rng)
        comps = jax.random.categorical(k_comp, jnp.log(self.weights), shape=(n,))
        eps = jax.random.normal(k_eps, (n, self.means.shape[1]), dtype=jnp.float32)
        chol = self.chols[comps]                              # [n, D, D]
        return self.means[comps] + jnp.einsum("nij,nj->ni", chol, eps)

    def sample_np(self, rng: np.random.Generator, n: int) -> np.ndarray:
        """Host-side sampler (same distribution as `sample`, numpy RNG).

        For serving: eager device dispatch costs seconds per op through a
        remote-attached backend, and jitting would recompile per distinct
        n — a tiny 18-dim draw belongs on the host. Call on a
        `jax.device_get(gmm)` host copy to avoid per-call fetches."""
        w = np.asarray(self.weights, np.float64)
        comps = rng.choice(len(w), size=n, p=w / w.sum())
        chol = np.asarray(self.chols, np.float64)[comps]
        eps = rng.standard_normal((n, chol.shape[-1]))
        mu = np.asarray(self.means, np.float64)[comps]
        return (mu + np.einsum("nij,nj->ni", chol, eps)).astype(np.float32)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """Log density of x [N, D] under the mixture."""
        D = self.means.shape[1]
        diff = x[:, None, :] - self.means[None, :, :]          # [N, M, D]
        chols = jnp.broadcast_to(
            self.chols[None], (x.shape[0],) + self.chols.shape
        )
        sol = jax.scipy.linalg.solve_triangular(
            chols, diff[..., None], lower=True
        )[..., 0]
        maha = jnp.sum(sol * sol, axis=-1)                     # [N, M]
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(self.chols, axis1=-2, axis2=-1)), axis=-1
        )
        log_comp = -0.5 * (maha + logdet + D * jnp.log(2.0 * jnp.pi))
        return jax.scipy.special.logsumexp(jnp.log(self.weights)[None] + log_comp, axis=-1)


def fit_gmm(
    x: np.ndarray,
    n_components: int = 10,
    n_iter: int = 100,
    seed: int = 0,
    reg_covar: float = 1e-6,
) -> GMM:
    """Full-covariance EM in numpy (host-side, replaces sklearn's fitter)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, dtype=np.float64)
    n, d = x.shape
    means = x[rng.choice(n, n_components, replace=False)]
    covs = np.tile(np.cov(x.T) + reg_covar * np.eye(d), (n_components, 1, 1))
    weights = np.full(n_components, 1.0 / n_components)

    for _ in range(n_iter):
        # E-step: responsibilities via stable log densities
        log_r = np.zeros((n, n_components))
        for k in range(n_components):
            chol = np.linalg.cholesky(covs[k])
            sol = np.linalg.solve(chol, (x - means[k]).T).T
            maha = np.sum(sol**2, axis=1)
            logdet = 2.0 * np.sum(np.log(np.diag(chol)))
            log_r[:, k] = np.log(weights[k]) - 0.5 * (maha + logdet + d * np.log(2 * np.pi))
        log_r -= log_r.max(axis=1, keepdims=True)
        r = np.exp(log_r)
        r /= r.sum(axis=1, keepdims=True)

        # M-step
        nk = r.sum(axis=0) + 1e-10
        weights = nk / n
        means = (r.T @ x) / nk[:, None]
        for k in range(n_components):
            diff = x - means[k]
            covs[k] = (r[:, k, None] * diff).T @ diff / nk[k] + reg_covar * np.eye(d)

    return GMM.create(weights, means, covs)
