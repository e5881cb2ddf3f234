"""OpenFace nn4.small2 Inception network (FaceNet-style).

96×96×3 → 128-D l2-normalized embedding, mirroring the graph the
reference hand-builds layer by layer
(reference: deep_insight_face/networks/inceptionv3.py:63-309): stem
convs with LRN, inception blocks 3a/3b/3c/4a/4e/5a/5b (with the L2-pool
branches of 3b/4a/5a, reference :160-163), global average pool and a
dense projection. Here the whole family is one parameterized
``InceptionBlock`` instead of seven copies of branch code.

Weight porting from OpenFace CSV dumps is in utils/weights.py
(reference loader: networks/inceptionv3.py:15-60).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from deep_insight_face_tpu.models.layers import (
    ConvBN,
    Dtype,
    global_avg_pool,
    l2_normalize,
    l2_pool,
    local_response_norm,
)

_BN_EPS = 1e-3  # Keras BatchNormalization default used by the reference graph


class InceptionBlock(nn.Module):
    """One Inception module with optional 1×1 / 3×3 / 5×5 / pool branches.

    ``pool`` ∈ {"max", "l2"}; ``pool_proj`` of 0 means no projection conv
    after pooling (the stride-2 reduction blocks 3c/4e).
    """

    one: int = 0  # 1×1 branch features
    three_reduce: int = 0
    three: int = 0
    five_reduce: int = 0
    five: int = 0
    pool: str = "max"
    pool_proj: int = 0
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(epsilon=_BN_EPS, dtype=self.dtype, param_dtype=self.param_dtype)
        s = (self.stride, self.stride)
        branches = []

        if self.three:
            b = ConvBN(self.three_reduce, (1, 1), name="three_reduce", **kw)(x, train)
            b = ConvBN(self.three, (3, 3), strides=s, name="three", **kw)(b, train)
            branches.append(b)

        if self.five:
            b = ConvBN(self.five_reduce, (1, 1), name="five_reduce", **kw)(x, train)
            b = ConvBN(self.five, (5, 5), strides=s, name="five", **kw)(b, train)
            branches.append(b)

        if self.pool == "l2":
            p = l2_pool(x, (3, 3), strides=s)
        else:
            p = nn.max_pool(x, (3, 3), strides=s, padding="SAME")
        if self.pool_proj:
            p = ConvBN(self.pool_proj, (1, 1), name="pool_proj", **kw)(p, train)
        branches.append(p)

        if self.one:
            branches.append(ConvBN(self.one, (1, 1), name="one", **kw)(x, train))

        return jnp.concatenate(branches, axis=-1)


class InceptionNN4Small2(nn.Module):
    """nn4.small2 topology (input 96×96×3)."""

    embedding_size: int = 128
    l2_output: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(epsilon=_BN_EPS, dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        # stem
        x = ConvBN(64, (7, 7), strides=(2, 2), use_bias=True, name="conv1", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = local_response_norm(x.astype(jnp.float32)).astype(self.dtype)
        x = ConvBN(64, (1, 1), use_bias=True, name="conv2", **kw)(x, train)
        x = ConvBN(192, (3, 3), use_bias=True, name="conv3", **kw)(x, train)
        x = local_response_norm(x.astype(jnp.float32)).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        # inception stacks (nn4.small2 branch table)
        x = InceptionBlock(one=64, three_reduce=96, three=128, five_reduce=16,
                           five=32, pool="max", pool_proj=32,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="inception_3a")(x, train)
        x = InceptionBlock(one=64, three_reduce=96, three=128, five_reduce=32,
                           five=64, pool="l2", pool_proj=64,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="inception_3b")(x, train)
        x = InceptionBlock(three_reduce=128, three=256, five_reduce=32, five=64,
                           pool="max", stride=2,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="inception_3c")(x, train)
        x = InceptionBlock(one=256, three_reduce=96, three=192, five_reduce=32,
                           five=64, pool="l2", pool_proj=128,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="inception_4a")(x, train)
        x = InceptionBlock(three_reduce=160, three=256, five_reduce=64, five=128,
                           pool="max", stride=2,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="inception_4e")(x, train)
        x = InceptionBlock(one=256, three_reduce=96, three=384, pool="l2",
                           pool_proj=96,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="inception_5a")(x, train)
        x = InceptionBlock(one=256, three_reduce=96, three=384, pool="max",
                           pool_proj=96,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="inception_5b")(x, train)

        x = global_avg_pool(x)
        x = nn.Dense(
            self.embedding_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="dense",
        )(x)
        x = x.astype(jnp.float32)
        return l2_normalize(x) if self.l2_output else x
