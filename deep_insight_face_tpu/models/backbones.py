"""Backbone CNNs: ResNetV2, MobileNetV2, VGG16 — the reference's backbone
menu (reference: deep_insight_face/networks/siamese.py:81-89,
networks/triplet.py:87-100) rebuilt as NHWC Flax modules with a bf16
compute path for the MXU.

Structure follows the Keras applications graphs closely enough that a
layer-by-layer weight port is mechanical (see utils/weights.py), but the
code is organized TPU-first: static shapes, channel counts kept at
multiples of 128 where the architecture allows, and an optional
``remat`` flag that wraps each stage in jax.checkpoint to trade FLOPs
for HBM.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_insight_face_tpu.models.layers import ConvBN, Dtype


# ---------------------------------------------------------------------------
# ResNetV2 (pre-activation)
# ---------------------------------------------------------------------------


class _PreactBottleneck(nn.Module):
    """Pre-activation bottleneck block (He et al. 2016, identity mappings).

    Keras-V2 convention: the stride lives on the 3×3 conv; the first block
    of a stack projects the shortcut from the pre-activated input, blocks
    with stride pool the shortcut.
    """

    filters: int
    stride: int = 1
    project: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        preact = nn.BatchNorm(
            use_running_average=not train,
            epsilon=1.001e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="preact_bn",
        )(x)
        preact = nn.relu(preact)

        if self.project:
            shortcut = nn.Conv(
                4 * self.filters,
                (1, 1),
                strides=(self.stride, self.stride),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="shortcut_conv",
            )(preact)
        elif self.stride > 1:
            shortcut = nn.max_pool(x, (1, 1), strides=(self.stride, self.stride))
        else:
            shortcut = x

        y = nn.Conv(
            self.filters, (1, 1), use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv1",
        )(preact)
        y = nn.BatchNorm(
            use_running_average=not train, epsilon=1.001e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, epsilon=1.001e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn2",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            4 * self.filters, (1, 1),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv3",
        )(y)
        return shortcut + y


class ResNetV2(nn.Module):
    """Pre-activation ResNet; ``depths=(3, 4, 6, 3)`` is ResNet50V2."""

    depths: Sequence[int] = (3, 4, 6, 3)
    filters: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            dtype=self.dtype, param_dtype=self.param_dtype, name="stem_conv",
        )(x)
        # Keras ResNet50V2 ZERO-pads before the stem max-pool (ZeroPadding2D
        # + MaxPooling2D valid). Stem conv outputs can be negative, so
        # zero-vs--inf padding changes border activations; matching Keras
        # keeps a layer-by-layer weight port numerically mechanical.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        block_cls = _PreactBottleneck
        if self.remat:
            block_cls = nn.remat(_PreactBottleneck, static_argnums=(2,))

        n_stages = len(self.depths)
        for stage, (depth, filters) in enumerate(zip(self.depths, self.filters)):
            for block in range(depth):
                # Keras V2: stride on the LAST block of each stack except the
                # final stack; first block of every stack projects.
                is_last = block == depth - 1
                stride = 2 if (is_last and stage < n_stages - 1) else 1
                x = block_cls(
                    filters=filters,
                    stride=stride,
                    project=(block == 0),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"stage{stage + 2}_block{block + 1}",
                )(x, train)

        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1.001e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="post_bn",
        )(x)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------


def _correct_pad(hw: Tuple[int, int], kernel: int = 3):
    """Keras-style asymmetric padding for stride-2 convs: (1,1) when the
    spatial size is odd, (0,1) when even — keeps output = ceil(in/2)."""
    return [((k % 2) if (s % 2) else 0, k % 2) for s, k in zip(hw, (kernel, kernel))]


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int
    norm: str = "batch"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = x
        if self.expand != 1:
            y = ConvBN(
                inp * self.expand, (1, 1), activation=nn.relu6,
                epsilon=1e-3, norm=self.norm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="expand",
            )(y, train)
        y = nn.Conv(
            y.shape[-1], (3, 3), strides=(self.stride, self.stride),
            padding="SAME" if self.stride == 1 else _correct_pad(y.shape[1:3]),
            feature_group_count=y.shape[-1], use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="dw_conv",
        )(y)
        from deep_insight_face_tpu.models.layers import make_norm

        y = make_norm(self.norm, 1e-3, self.dtype, self.param_dtype,
                      "dw_bn", y.shape[-1], train)(y)
        y = nn.relu6(y)
        y = ConvBN(
            self.features, (1, 1), activation=None, epsilon=1e-3,
            norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="project",
        )(y, train)
        if self.stride == 1 and inp == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    width: float = 1.0
    norm: str = "batch"  # "group": batch-independent, BN-shortcut-immune
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # (expand, features, repeats, first_stride)
    config: Sequence[Tuple[int, int, int, int]] = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        first = _make_divisible(32 * self.width)
        x = ConvBN(
            first, (3, 3), strides=(2, 2), padding=_correct_pad(x.shape[1:3]),
            activation=nn.relu6, epsilon=1e-3, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="stem",
        )(x, train)
        for i, (expand, features, repeats, stride) in enumerate(self.config):
            feats = _make_divisible(features * self.width)
            for r in range(repeats):
                x = _InvertedResidual(
                    features=feats,
                    stride=stride if r == 0 else 1,
                    expand=expand,
                    norm=self.norm,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{i}_{r}",
                )(x, train)
        last = _make_divisible(1280 * max(self.width, 1.0))
        x = ConvBN(
            last, (1, 1), activation=nn.relu6, epsilon=1e-3, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="head_conv",
        )(x, train)
        return x


# ---------------------------------------------------------------------------
# VGG16
# ---------------------------------------------------------------------------


class VGG16(nn.Module):
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    blocks: Sequence[Tuple[int, int]] = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN in VGG16
        x = x.astype(self.dtype)
        for b, (convs, feats) in enumerate(self.blocks):
            for c in range(convs):
                x = nn.Conv(
                    feats, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"block{b + 1}_conv{c + 1}",
                )(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def _build_resnet50v2(dtype, param_dtype, width=1.0, norm="batch",
                      remat=False):
    if width != 1.0:
        raise TypeError("resnet50v2 has no width multiplier "
                        f"(got width={width})")
    if norm != "batch":
        raise TypeError("resnet50v2 supports only BatchNorm (weight-port "
                        f"parity); got norm={norm!r} — use mobilenetv2 for "
                        "GroupNorm")
    return ResNetV2(dtype=dtype, param_dtype=param_dtype, remat=remat)


def _build_mobilenetv2(dtype, param_dtype, width=1.0, norm="batch",
                       remat=False):
    if remat:
        raise TypeError("mobilenetv2 does not implement remat")
    return MobileNetV2(width=width, norm=norm, dtype=dtype,
                       param_dtype=param_dtype)


def _build_vgg16(dtype, param_dtype, width=1.0, norm="batch", remat=False):
    if width != 1.0:
        raise TypeError(f"vgg16 has no width multiplier (got width={width})")
    if norm != "batch":
        raise TypeError("vgg16 has no normalization layers; "
                        f"norm={norm!r} is unsupported")
    if remat:
        raise TypeError("vgg16 does not implement remat")
    return VGG16(dtype=dtype, param_dtype=param_dtype)


# Builders validate their kwargs: a config field a backbone cannot honor
# (norm='group' on resnet50v2, remat on mobilenetv2, width on vgg16…)
# raises TypeError instead of being swallowed — embedding.py documents
# exactly that contract, and GroupNorm silently degrading to BatchNorm
# would re-open the BN batch-stat shortcut it exists to mitigate.
BACKBONES = {
    "resnet50v2": _build_resnet50v2,
    "mobilenetv2": _build_mobilenetv2,
    "vgg16": _build_vgg16,
}
