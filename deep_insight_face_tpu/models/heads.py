"""Embedding heads mapping backbone feature maps to D-dim embeddings.

Reference head variants (reference:
deep_insight_face/networks/siamese.py:91-128 "v1"/"v2" and
networks/triplet.py:102-146 "v1"/"v2"/"v3"):

- ``conv`` (v1): small conv stack → flatten → linear dense;
- ``dense`` (siamese v2): 1×1 convs + BN → flatten → dropout → relu dense;
- ``gdc`` (triplet v2, ArcFace-style): 1×1 conv 512 → BN → PReLU →
  full-size depthwise conv (global depthwise "GDC") → BN → 1×1 conv to
  D → dropout → dense → l2-normalize.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from deep_insight_face_tpu.models.layers import Dtype, PReLU2D, l2_normalize

_BN_EPS = 1e-3


class ConvHead(nn.Module):
    """v1: Conv64(2×2) → pool → drop → Conv32(2×2) → pool → drop → Dense."""

    embedding_size: int = 128
    dropout_rate: float = 0.3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.relu(nn.Conv(64, (2, 2), padding="SAME", name="conv_a", **kw)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(nn.Conv(32, (2, 2), padding="SAME", name="conv_b", **kw)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.embedding_size, name="embeddings", **kw)(x)
        return x.astype(jnp.float32)


class DenseHead(nn.Module):
    """siamese v2: 1×1 conv 128 ×2 with pooling, BN, dropout, relu dense."""

    embedding_size: int = 128
    dropout_rate: float = 0.3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.relu(nn.Conv(128, (1, 1), name="conv_a", **kw)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        x = nn.relu(nn.Conv(128, (1, 1), name="conv_b", **kw)(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=_BN_EPS, name="bn", **kw
        )(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.embedding_size, name="norm_embedding", **kw)(x))
        return x.astype(jnp.float32)


class GDCHead(nn.Module):
    """ArcFace-style global-depthwise-conv head with l2-normalized output."""

    embedding_size: int = 128
    dropout_rate: float = 0.3
    l2_output: bool = True
    norm: str = "batch"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from deep_insight_face_tpu.models.layers import make_norm

        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(512, (1, 1), use_bias=False, name="conv_512", **kw)(x)
        x = make_norm(self.norm, _BN_EPS, self.dtype, self.param_dtype,
                      "bn1", 512, train)(x)
        x = PReLU2D(param_dtype=self.param_dtype)(x)
        # global depthwise conv: kernel covers the whole feature map
        h, w = x.shape[1], x.shape[2]
        x = nn.Conv(
            x.shape[-1], (h, w), padding="VALID",
            feature_group_count=x.shape[-1], use_bias=False,
            name="gdc_dw", **kw,
        )(x)
        x = make_norm(self.norm, _BN_EPS, self.dtype, self.param_dtype,
                      "bn2", x.shape[-1], train)(x)
        x = nn.Conv(self.embedding_size, (1, 1), use_bias=False, name="conv_emb", **kw)(x)
        if 0.0 < self.dropout_rate < 1.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(
            self.embedding_size, use_bias=False,
            kernel_init=nn.initializers.glorot_normal(), name="dense_emb", **kw,
        )(x)
        x = x.astype(jnp.float32)
        return l2_normalize(x) if self.l2_output else x


class FlattenHead(nn.Module):
    """v3 passthrough: flatten the feature map (reference: triplet.py:143-146)."""

    embedding_size: int = 0  # unused; kept for a uniform constructor surface
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        return x.reshape((x.shape[0], -1)).astype(jnp.float32)


HEADS = {
    "v1": ConvHead,
    "conv": ConvHead,
    "v2_siamese": DenseHead,
    "dense": DenseHead,
    "v2": GDCHead,
    "gdc": GDCHead,
    "v3": FlattenHead,
    "none": FlattenHead,
}
