"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def interpret_mode() -> bool:
    """Pallas kernels run interpreted off-TPU (CPU tests / virtual meshes)."""
    return not on_tpu()


def pad_dim(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    """Zero/value-pad ``axis`` of ``x`` up to the next multiple."""
    size = x.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value)
