"""Landmark regression losses (for training models/landmark.LandmarkNet).

Wing loss (Feng et al. 2018) — the standard landmark objective behind
PFLD-style detectors (PFLD: arXiv 1902.10859, PAPERS.md): behaves like
a scaled log near zero (amplifying small/medium errors that L2 washes
out) and like L1 in the tail.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def wing_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    omega: float = 10.0,
    epsilon: float = 2.0,
    reduce: bool = True,
) -> jnp.ndarray:
    """``pred``/``target``: (..., K, 2) landmark coordinates (same units).

    wing(x) = ω·ln(1 + |x|/ε)        for |x| < ω
            = |x| − C                otherwise,  C = ω − ω·ln(1 + ω/ε)
    """
    x = jnp.abs(pred - target)
    c = omega - omega * math.log(1.0 + omega / epsilon)
    loss = jnp.where(
        x < omega, omega * jnp.log1p(x / epsilon), x - c
    )
    per_sample = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
    return jnp.mean(per_sample) if reduce else per_sample


def normalized_mean_error(
    pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """NME: mean point-to-point error normalized by inter-ocular distance
    (landmark indices 36/45 in the 68-pt scheme) — the standard landmark
    eval metric."""
    d = jnp.linalg.norm(pred - target, axis=-1)  # (..., K)
    iod = jnp.linalg.norm(target[..., 45, :] - target[..., 36, :], axis=-1)
    return jnp.mean(jnp.mean(d, axis=-1) / jnp.maximum(iod, eps))
