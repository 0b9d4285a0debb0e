"""Frechet Inception Distance machinery.

Replaces the reference's torchmetrics FID(reset_real_features=False,
normalize=True) (reference trainers/vae_trainer.py:119,354-371):

  * running first/second-moment accumulation per distribution (real/fake),
  * real features ingested ONCE (the reference guards with
    real_features_num_samples, vae_trainer.py:359-361; here `update_real_once`
    latches after the first full epoch),
  * Frechet distance ||mu_r - mu_f||^2 + tr(S_r + S_f - 2 sqrt(S_r S_f))
    with the matrix square root computed on host in float64.

The feature extractor is pluggable: the canonical choice is InceptionV3
(pool3, 2048-d) loaded from a torch-format weight file via
`inception.try_load_inception`; any callable (N,H,W,3)->[0,1] -> (N,D)
works (tests use a small random projection).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


class RunningStats:
    """Streaming mean/covariance over feature batches."""

    def __init__(self, dim: int):
        self.dim = dim
        self.reset()

    def reset(self):
        self.n = 0
        self.sum = np.zeros((self.dim,), np.float64)
        self.outer = np.zeros((self.dim, self.dim), np.float64)

    def update(self, feats: np.ndarray):
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(0)
        self.outer += f.T @ f

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        if self.n < 2:
            raise ValueError("need >= 2 samples for covariance")
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + tr(C1 + C2 - 2 (C1 C2)^(1/2)), float64 on host."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1, cov2 = np.asarray(cov1, np.float64), np.asarray(cov2, np.float64)
    diff = mu1 - mu2

    # sqrtm(C1 C2) via eigendecomposition of the symmetrized product:
    # sqrtm(C1 C2) has the same trace as sqrtm(C1^1/2 C2 C1^1/2), which is
    # symmetric PSD — numerically robust without scipy.
    s, u = np.linalg.eigh(cov1)
    s = np.clip(s, 0, None)
    sqrt_c1 = (u * np.sqrt(s)) @ u.T
    inner = sqrt_c1 @ cov2 @ sqrt_c1
    s2, _ = np.linalg.eigh(inner)
    tr_sqrt = np.sqrt(np.clip(s2, 0, None)).sum()

    if not np.isfinite(tr_sqrt):
        if not (np.isfinite(cov1).all() and np.isfinite(cov2).all()):
            # NaN covariances (diverged features) can never be repaired by a
            # diagonal offset — fail loudly instead of recursing forever
            raise ValueError("non-finite covariance in frechet_distance")
        if eps > 1e-2:
            raise ValueError("frechet_distance failed to stabilize (eps cap)")
        offset = np.eye(cov1.shape[0]) * eps
        return frechet_distance(mu1, cov1 + offset, mu2, cov2 + offset, eps=eps * 10)

    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)


class FID:
    """torchmetrics-compatible usage: update fake every epoch, real once."""

    def __init__(self, feature_fn: Callable, dim: int):
        self.feature_fn = jax.jit(feature_fn)
        self.real = RunningStats(dim)
        self.fake = RunningStats(dim)
        self._real_done = False

    def _features(self, images01) -> np.ndarray:
        """(N, D) features on host.  Multi-host eval batches are globally
        sharded jax Arrays; the (small) feature output is gathered across
        processes so every host accumulates the same global statistics."""
        feats = self.feature_fn(images01)
        if isinstance(feats, jax.Array) and not feats.is_fully_addressable:
            from jax.experimental import multihost_utils

            feats = multihost_utils.process_allgather(feats, tiled=True)
        return np.asarray(feats)

    def update_fake(self, images01, n_valid: int | None = None) -> None:
        """`n_valid` drops trailing pad rows (full-coverage eval batches keep
        one compiled feature_fn shape by padding the tail batch)."""
        self.fake.update(self._features(images01)[:n_valid])

    def update_real_once(self, images01, n_valid: int | None = None) -> None:
        """Ingest real features only until the first compute() latches them
        (reference reset_real_features=False semantics)."""
        if not self._real_done:
            self.real.update(self._features(images01)[:n_valid])

    def reset_fake(self) -> None:
        self.fake.reset()

    def compute(self) -> float:
        mu_f, cov_f = self.fake.finalize()
        mu_r, cov_r = self.real.finalize()
        self._real_done = True
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)
