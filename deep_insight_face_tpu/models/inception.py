"""OpenFace nn4.small2 Inception network (FaceNet-style).

96×96×3 → 128-D l2-normalized embedding, mirroring the graph the
reference hand-builds layer by layer
(reference: deep_insight_face/networks/inceptionv3.py:63-309) — exactly,
so OpenFace CSV / .h5 weight ports are numerically mechanical:

- every conv has a bias and is followed by BatchNorm(eps=1e-5) + relu
  (reference :97-98 and conv2d_bn :310-334);
- spatial pools are VALID (Keras default) with explicit zero-padding
  before convs (ZeroPadding2D) — including the odd-looking pool branches
  that DOWNSAMPLE (maxpool3/2 or the L2-pool avgpool3/3 trick,
  reference :160-163) and then zero-pad back up to the block's spatial
  size (e.g. ((3,4),(3,4)) in 3a, reference :133);
- concat order is [3×3, 5×5, pool, 1×1] over the branches present
  (reference :141, :173, :197, :252, :300).

Here the seven hand-copied blocks are one parameterized
``InceptionBlock``. Weight porting from OpenFace CSV dumps is in
utils/weights.py (reference loader: networks/inceptionv3.py:15-60).
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
    local_response_norm,
)

_BN_EPS = 1e-5  # the reference passes epsilon=0.00001 on every BN (:98 etc.)

PadPair = Tuple[Tuple[int, int], Tuple[int, int]]


def _pad2d(x, pad: PadPair):
    (t, b), (l, r) = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class InceptionBlock(nn.Module):
    """One nn4.small2 Inception module.

    Branches (concatenated in this order, reference :141):

    - 3×3: 1×1 reduce → zero-pad 1 → 3×3 conv (possibly stride 2)
    - 5×5: 1×1 reduce → zero-pad 2 → 5×5 conv (possibly stride 2)
    - pool: ``pool`` ∈ {"max": maxpool3/2 VALID, "l2": x²→avgpool3/3
      VALID→×9→sqrt (reference :160-163)}, optional 1×1 projection,
      then zero-pad ``pool_pad`` back to the block's spatial size
    - 1×1: plain 1×1 conv

    Every conv carries a bias and BN(eps=1e-5)+relu.
    """

    one: int = 0  # 1×1 branch features
    three_reduce: int = 0
    three: int = 0
    five_reduce: int = 0
    five: int = 0
    stride: int = 1  # stride of the 3×3/5×5 main convs (reduction blocks)
    pool: str = "max"
    pool_proj: int = 0
    pool_pad: PadPair = ((0, 0), (0, 0))
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(epsilon=_BN_EPS, use_bias=True, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        s = (self.stride, self.stride)
        branches = []

        if self.three:
            b = ConvBN(self.three_reduce, (1, 1), name="three_reduce", **kw)(x, train)
            # ZeroPadding2D(1) + VALID conv (reference conv2d_bn :327-330)
            b = ConvBN(self.three, (3, 3), strides=s, padding=((1, 1), (1, 1)),
                       name="three", **kw)(b, train)
            branches.append(b)

        if self.five:
            b = ConvBN(self.five_reduce, (1, 1), name="five_reduce", **kw)(x, train)
            b = ConvBN(self.five, (5, 5), strides=s, padding=((2, 2), (2, 2)),
                       name="five", **kw)(b, train)
            branches.append(b)

        if self.pool == "l2":
            # x² → avgpool3 stride 3 VALID → ×9 → sqrt (reference :160-163)
            p = nn.avg_pool(jnp.square(x), (3, 3), strides=(3, 3), padding="VALID")
            p = jnp.sqrt(jnp.maximum(p * 9.0, 1e-12))
        else:
            # Keras MaxPooling2D(pool_size=3, strides=2) — VALID, downsampling
            p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        if self.pool_proj:
            p = ConvBN(self.pool_proj, (1, 1), name="pool_proj", **kw)(p, train)
        # zero-pad the (smaller) pooled map back to the block's spatial size
        # (reference ZeroPadding2D after the pool branch, e.g. :133, :167)
        p = _pad2d(p, self.pool_pad)
        branches.append(p)

        if self.one:
            branches.append(ConvBN(self.one, (1, 1), name="one", **kw)(x, train))

        return jnp.concatenate(branches, axis=-1)


class InceptionNN4Small2(nn.Module):
    """nn4.small2 topology — input must be 96×96×3 (reference asserts the
    same, :66)."""

    embedding_size: int = 128
    l2_output: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[1:3] != (96, 96):
            raise ValueError(
                f"InceptionNN4Small2 requires 96×96 input, got {x.shape}"
            )
        kw = dict(epsilon=_BN_EPS, use_bias=True, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        # stem (reference :95-113): ZeroPad(3) + 7×7/2 VALID; ZeroPad(1) +
        # maxpool3/2 VALID; LRN; 1×1; ZeroPad(1) + 3×3 VALID; LRN;
        # ZeroPad(1) + maxpool3/2 VALID
        x = ConvBN(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                   name="conv1", **kw)(x, train)
        x = _pad2d(x, ((1, 1), (1, 1)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = local_response_norm(x.astype(jnp.float32)).astype(self.dtype)
        x = ConvBN(64, (1, 1), name="conv2", **kw)(x, train)
        x = ConvBN(192, (3, 3), padding=((1, 1), (1, 1)), name="conv3", **kw)(x, train)
        x = local_response_norm(x.astype(jnp.float32)).astype(self.dtype)
        x = _pad2d(x, ((1, 1), (1, 1)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")  # 12×12×192

        blk = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # branch tables + pool pads straight off the reference graph
        x = InceptionBlock(one=64, three_reduce=96, three=128, five_reduce=16,
                           five=32, pool="max", pool_proj=32,
                           pool_pad=((3, 4), (3, 4)),  # reference :133
                           name="inception_3a", **blk)(x, train)
        x = InceptionBlock(one=64, three_reduce=96, three=128, five_reduce=32,
                           five=64, pool="l2", pool_proj=64,
                           pool_pad=((4, 4), (4, 4)),  # reference :167
                           name="inception_3b", **blk)(x, train)
        x = InceptionBlock(three_reduce=128, three=256, five_reduce=32, five=64,
                           stride=2, pool="max",
                           pool_pad=((0, 1), (0, 1)),  # reference :196
                           name="inception_3c", **blk)(x, train)  # 6×6×640
        x = InceptionBlock(one=256, three_reduce=96, three=192, five_reduce=32,
                           five=64, pool="l2", pool_proj=128,
                           pool_pad=((2, 2), (2, 2)),  # reference :225
                           name="inception_4a", **blk)(x, train)
        x = InceptionBlock(three_reduce=160, three=256, five_reduce=64, five=128,
                           stride=2, pool="max",
                           pool_pad=((0, 1), (0, 1)),  # reference :251
                           name="inception_4e", **blk)(x, train)  # 3×3×1024
        x = InceptionBlock(one=256, three_reduce=96, three=384, pool="l2",
                           pool_proj=96,
                           pool_pad=((1, 1), (1, 1)),  # reference :275
                           name="inception_5a", **blk)(x, train)
        x = InceptionBlock(one=256, three_reduce=96, three=384, pool="max",
                           pool_proj=96,
                           pool_pad=((1, 1), (1, 1)),  # reference :295
                           name="inception_5b", **blk)(x, train)  # 3×3×736

        # AveragePooling2D(3, strides=1) VALID on 3×3 ≡ global average pool
        # (reference :302-303), then Dense (reference :304)
        x = global_avg_pool(x)
        x = nn.Dense(
            self.embedding_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="dense",
        )(x)
        x = x.astype(jnp.float32)
        return l2_normalize(x) if self.l2_output else x
