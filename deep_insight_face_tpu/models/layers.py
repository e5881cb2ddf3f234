"""Shared building blocks for the model zoo.

All modules are NHWC, take a ``dtype`` (compute, default bfloat16 on the
MXU) and ``param_dtype`` (storage, float32), and avoid any Python-level
data-dependent control flow so they jit cleanly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def group_count(features: int, preferred: int = 32) -> int:
    """Largest group count ≤ preferred dividing ``features``."""
    for g in (preferred, 16, 8, 4, 2):
        if g <= preferred and features % g == 0:
            return g
    return 1


def make_norm(norm: str, epsilon: float, dtype, param_dtype, name: str,
              features: int, train: bool):
    """Normalization layer factory: "batch" (running stats, weight-port
    compatible) or "group" (batch-independent — immune to the BN
    batch-statistics shortcut ArcFace can converge to on small worlds;
    see parallel/train_step.make_train_step)."""
    if norm == "group":
        return nn.GroupNorm(
            num_groups=group_count(features), epsilon=epsilon,
            dtype=dtype, param_dtype=param_dtype, name=name,
        )
    return nn.BatchNorm(
        use_running_average=not train, epsilon=epsilon,
        dtype=dtype, param_dtype=param_dtype, name=name,
    )


class ConvBN(nn.Module):
    """Conv → BatchNorm/GroupNorm → (optional) activation."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    activation: Optional[Callable] = nn.relu
    epsilon: float = 1.001e-5
    norm: str = "batch"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = make_norm(self.norm, self.epsilon, self.dtype, self.param_dtype,
                      "bn", self.features, train)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class PReLU2D(nn.Module):
    """PReLU with slopes shared over spatial dims (one per channel),
    matching Keras ``PReLU(shared_axes=[1, 2])``."""

    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), self.param_dtype
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def l2_pool(x: jnp.ndarray, window: Tuple[int, int], strides: Tuple[int, int],
            padding: str = "SAME") -> jnp.ndarray:
    """L2 pooling via sqrt(avg_pool(x²)·k²/…) — the x²→avgpool→×n→sqrt trick
    the OpenFace graph uses (reference: networks/inceptionv3.py:160-163)."""
    n = window[0] * window[1]
    sq = nn.avg_pool(jnp.square(x), window, strides=strides, padding=padding)
    return jnp.sqrt(jnp.maximum(sq * n, 1e-12))


def local_response_norm(
    x: jnp.ndarray,
    depth_radius: int = 5,
    bias: float = 1.0,
    alpha: float = 1e-4,
    beta: float = 0.75,
) -> jnp.ndarray:
    """tf.nn.local_response_normalization semantics over the channel axis
    (reference: networks/inceptionv3.py:95)."""
    sq = jnp.square(x)
    # sum over a window of 2*depth_radius+1 channels centered at each channel
    c = x.shape[-1]
    pads = [(0, 0)] * (x.ndim - 1) + [(depth_radius, depth_radius)]
    padded = jnp.pad(sq, pads)
    window = 2 * depth_radius + 1
    stacked = jnp.stack(
        [padded[..., i : i + c] for i in range(window)], axis=0
    )
    norm = jnp.sum(stacked, axis=0)
    return x / jnp.power(bias + alpha * norm, beta)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
