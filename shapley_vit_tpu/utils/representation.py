"""Representation-similarity metrics: CKA, sliced Wasserstein distance, IRM
KL regularizer.

Reference: ``federated_learning/utils.py:1134-1242`` (``CKA_Torch`` with
linear and RBF-kernel HSIC, ``sliced_wasserstein_distance`` with L2-normalized
random projections, ``get_irm_loss`` symmetric-ish KL). Pure JAX, jittable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# CKA (utils.py:1140-1180)
# ---------------------------------------------------------------------------

def _centering(K: jax.Array) -> jax.Array:
    n = K.shape[0]
    unit = jnp.ones((n, n), K.dtype) / n
    H = jnp.eye(n, dtype=K.dtype) - unit
    HK = jnp.matmul(H, K, precision="highest")
    return jnp.matmul(HK, H, precision="highest")


def _rbf(X: jax.Array, sigma: Optional[float] = None) -> jax.Array:
    GX = jnp.matmul(X, X.T, precision="highest")
    KX = jnp.diag(GX)[:, None] - GX
    KX = KX + KX.T
    if sigma is None:
        # torch.median semantics (utils.py:1153: the LOWER of the two middle
        # elements for an even count — numpy's averaged midpoint differs at
        # the 1e-4 CKA level; gold-tested against the reference's own code).
        # Sort pushes the NaN-masked zeros last; dynamic index is jittable.
        flat = KX.reshape(-1)
        nz = jnp.where(flat != 0, flat, jnp.nan)
        count = jnp.sum(flat != 0)
        mdist = jnp.sort(nz)[jnp.maximum(count - 1, 0) // 2]
        sigma = jnp.sqrt(mdist)
    return jnp.exp(KX * (-0.5 / (sigma * sigma)))


def linear_hsic(X: jax.Array, Y: jax.Array) -> jax.Array:
    L_X = jnp.matmul(X, X.T, precision="highest")
    L_Y = jnp.matmul(Y, Y.T, precision="highest")
    return jnp.sum(_centering(L_X) * _centering(L_Y))


def kernel_hsic(X: jax.Array, Y: jax.Array, sigma: Optional[float] = None) -> jax.Array:
    return jnp.sum(_centering(_rbf(X, sigma)) * _centering(_rbf(Y, sigma)))


def linear_cka(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Linear CKA(X, Y) ∈ [0, 1]; 1 iff representations are linearly
    equivalent (utils.py:1169-1174)."""
    hsic = linear_hsic(X, Y)
    return hsic / (jnp.sqrt(linear_hsic(X, X)) * jnp.sqrt(linear_hsic(Y, Y)))


def kernel_cka(X: jax.Array, Y: jax.Array, sigma: Optional[float] = None) -> jax.Array:
    hsic = kernel_hsic(X, Y, sigma)
    return hsic / (
        jnp.sqrt(kernel_hsic(X, X, sigma)) * jnp.sqrt(kernel_hsic(Y, Y, sigma))
    )


# ---------------------------------------------------------------------------
# sliced Wasserstein (utils.py:1182-1242)
# ---------------------------------------------------------------------------

def rand_projections(key: jax.Array, embedding_dim: int, num_samples: int = 50) -> jax.Array:
    """L2-normalized Gaussian directions [num_samples, dim]
    (utils.py:1182-1195 — explicit PRNG key instead of global numpy state)."""
    w = jax.random.normal(key, (num_samples, embedding_dim))
    return w / jnp.linalg.norm(w, axis=1, keepdims=True)


def sliced_wasserstein_distance(
    encoded_samples: jax.Array,
    distribution_samples: jax.Array,
    key: Optional[jax.Array] = None,
    num_projections: int = 50,
    p: int = 2,
    projections: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean SWD between two sample sets (utils.py:1198-1242): project both on
    random directions, sort per projection, mean |Δ|^p. ``projections``
    overrides the drawn directions (deterministic replay / the gold oracle
    mirrors the reference's global-numpy draws through it)."""
    key = key if key is not None else jax.random.key(0)
    dim = distribution_samples.shape[1]
    proj = (
        jnp.asarray(projections)
        if projections is not None
        else rand_projections(key, dim, num_projections)
    )
    ep = jnp.sort(jnp.matmul(encoded_samples, proj.T, precision="highest").T, axis=1)
    dp = jnp.sort(jnp.matmul(distribution_samples, proj.T, precision="highest").T, axis=1)
    return jnp.mean(jnp.abs(ep - dp) ** p)


# ---------------------------------------------------------------------------
# IRM KL loss (utils.py:1134-1138)
# ---------------------------------------------------------------------------

def kl_div_batchmean(log_q: jax.Array, p: jax.Array) -> jax.Array:
    """torch F.kl_div(log_q, p, reduction='batchmean') = Σ p·(log p − log q)/B."""
    return jnp.sum(p * (jnp.log(p) - log_q)) / p.shape[0]


def get_irm_loss(target_mat: jax.Array, src_mat: jax.Array) -> jax.Array:
    """Inter-client relationship matching loss (utils.py:1134-1138):
    (KL(p_target‖q_src) + KL(p_target‖q_target)) / 2 with the reference's
    exact argument wiring (the second term is 0 by construction)."""
    return (
        kl_div_batchmean(jnp.log(src_mat), target_mat)
        + kl_div_batchmean(jnp.log(target_mat), target_mat)
    ) / 2.0
