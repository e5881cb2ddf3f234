"""YOLOv3 face detector graph (Darknet-53 + FPN heads) in Flax.

The reference loads a converted Keras .h5 of the same topology
(reference: deep_insight_face/detector/run.py:141 and the Darknet
converter scripts/yolo_convert_tf.py:38-234; config
detector/yolo_cfg/yolov3-face.cfg). Here the graph is native: NHWC,
bf16 compute, LeakyReLU(0.1), BN eps 1e-5 — layer naming is positional
(conv_0..conv_74 as in Darknet) so the binary-weight converter in
utils/darknet.py can map weights one-to-one.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_BN_EPS = 1e-5


class _DarkConv(nn.Module):
    """Conv → BN → LeakyReLU(0.1), Darknet-style."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    act: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = "SAME" if self.stride == 1 else [(1, 0), (1, 0)]  # darknet top-left pad
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad if self.kernel > 1 else "VALID",
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                epsilon=_BN_EPS,
                momentum=0.99,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="bn",
            )(x)
        if self.act:
            x = nn.leaky_relu(x, 0.1)
        return x


class _ResBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _DarkConv(self.features // 2, 1, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="conv1")(x, train)
        y = _DarkConv(self.features, 3, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="conv2")(y, train)
        return x + y


class Darknet53(nn.Module):
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = _DarkConv(32, 3, name="stem", **kw)(x, train)
        skips: List[jnp.ndarray] = []
        for i, (feats, blocks) in enumerate([(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]):
            x = _DarkConv(feats, 3, stride=2, name=f"down{i}", **kw)(x, train)
            for b in range(blocks):
                x = _ResBlock(feats, name=f"res{i}_{b}", **kw)(x, train)
            skips.append(x)
        # routes at 52×52 (256), 26×26 (512), 13×13 (1024)
        return skips[2], skips[3], skips[4]


class _FPNStage(nn.Module):
    """5-conv block + detection head conv; returns (branch, raw head)."""

    features: int
    out_features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(3):
            x = _DarkConv(self.features, 1, name=f"c{2 * i}", **kw)(x, train)
            if i < 2:
                x = _DarkConv(self.features * 2, 3, name=f"c{2 * i + 1}", **kw)(x, train)
        branch = x
        y = _DarkConv(self.features * 2, 3, name="pre_head", **kw)(x, train)
        head = _DarkConv(
            self.out_features, 1, use_bn=False, act=False, name="head", **kw
        )(y, train)
        return branch, head


class YoloV3Tiny(nn.Module):
    """yolov3-tiny topology: 2 detection scales (strides 32/16), ~12×
    fewer FLOPs than the full model — the serving-tier detector.

    At v5e peak the full YOLOv3-416 (≈66 GFLOP/img) caps end-to-end
    throughput below the 5k faces/sec target on physics alone; tiny is
    the standard production trade (full YoloV3 remains for accuracy
    parity with the reference's converter path).
    """

    num_classes: int = 1
    anchors_per_scale: int = 3
    # Replace the 416²×16-channel stem conv with pixel-unshuffle(2) + a
    # 32-channel conv at 208²: the original stem fills ~3% of the MXU
    # (K=27, N=16 against 128×128 tiles) and dominates effective cost.
    # Not weight-compatible with darknet tiny files (train from scratch).
    space_to_depth: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out_ch = self.anchors_per_scale * (5 + self.num_classes)
        x = x.astype(self.dtype)
        feats = []
        if self.space_to_depth:
            n, h, w, c0 = x.shape
            x = x.reshape(n, h // 2, 2, w // 2, 2, c0)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c0)
            first, c = 1, 32  # one conv level replaced by the unshuffle
        else:
            first, c = 0, 16
        for i in range(first, 5):
            x = _DarkConv(c, 3, name=f"conv{i}", **kw)(x, train)
            if i == 4:
                feats.append(x)  # stride-16 route (256 ch)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            c *= 2
        x = _DarkConv(512, 3, name="conv5", **kw)(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = _DarkConv(1024, 3, name="conv6", **kw)(x, train)
        x = _DarkConv(256, 1, name="conv7", **kw)(x, train)

        y13 = _DarkConv(512, 3, name="head13_pre", **kw)(x, train)
        head13 = _DarkConv(out_ch, 1, use_bn=False, act=False,
                           name="head13", **kw)(y13, train)

        u = _DarkConv(128, 1, name="up_conv", **kw)(x, train)
        u = jax.image.resize(
            u, (u.shape[0], u.shape[1] * 2, u.shape[2] * 2, u.shape[3]),
            method="nearest",
        )
        y26 = jnp.concatenate([u, feats[0]], axis=-1)
        y26 = _DarkConv(256, 3, name="head26_pre", **kw)(y26, train)
        head26 = _DarkConv(out_ch, 1, use_bn=False, act=False,
                           name="head26", **kw)(y26, train)
        f32 = jnp.float32
        return head13.astype(f32), head26.astype(f32)


class YoloV3TinyMX(nn.Module):
    """MXU-shaped tiny face detector (2 scales, strides 32/16).

    Redesign of the tiny topology around the v5e MXU roofline measured
    in docs/PERF.md: the tiny_s2d conv ceiling bounds the fused pipeline
    at ≈11.6k faces/s because (a) the high-resolution levels run 16-64
    channels (the 128×128 systolic array is mostly idle) and (b) a third
    of the FLOPs sit in one 3×3 512→1024 conv and one 3×3 384→256 head
    conv. Changes, all MXU-shaping rather than capacity cuts:

    - pixel-unshuffle(4) stem: the 416² image enters as 104²×48, so the
      FIRST conv already contracts K=432 — there are no low-fill
      208²/416² levels at all.
    - one 3×3 conv per resolution level (104/52/26), channel-doubling to
      the stride-16 route at 256 — same route contract as YoloV3Tiny.
    - the deep (stride-32) trunk spends its depth in 1×1-256 → 3×3-512
      bottleneck pairs instead of a single 512→1024 conv (same
      receptive-field growth per pair, 3.6× fewer FLOPs).
    - the stride-16 head contracts its 384-channel concat through a 1×1
      before the 3×3 (464 MFLOP vs 1.2 GFLOP).

    ≈3.3 GFLOP/img @416 vs tiny_s2d's ≈5.5 with equal or better MXU
    fill per layer; head/decode contract identical to YoloV3Tiny
    (TINY_ANCHOR_MASKS). Not weight-compatible with any Darknet file —
    train with cli train-detector / scripts/train_detector_weights.py.
    """

    num_classes: int = 1
    anchors_per_scale: int = 3
    width: int = 64  # channels after the stem conv; doubles per level
    deep_blocks: int = 2  # 1×1→3×3 bottleneck pairs at stride 32
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out_ch = self.anchors_per_scale * (5 + self.num_classes)
        x = x.astype(self.dtype)
        n, h, w, c0 = x.shape
        # pixel-unshuffle(4): stride-4 space-to-depth, 3 → 48 channels
        x = x.reshape(n, h // 4, 4, w // 4, 4, c0)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * c0)
        c = self.width
        route = None
        for i in range(3):  # levels at strides 4, 8, 16
            x = _DarkConv(c, 3, name=f"level{i}", **kw)(x, train)
            if i == 2:
                route = x  # stride-16 route (width×4 = 256 channels)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            c *= 2
        x = _DarkConv(c, 3, name="deep_in", **kw)(x, train)  # stride 32
        for b in range(self.deep_blocks):
            x = _DarkConv(c // 2, 1, name=f"deep{b}_sq", **kw)(x, train)
            x = _DarkConv(c, 3, name=f"deep{b}_ex", **kw)(x, train)
        x = _DarkConv(c // 2, 1, name="trunk_out", **kw)(x, train)

        y13 = _DarkConv(c, 3, name="head13_pre", **kw)(x, train)
        head13 = _DarkConv(out_ch, 1, use_bn=False, act=False,
                           name="head13", **kw)(y13, train)

        u = _DarkConv(c // 4, 1, name="up_conv", **kw)(x, train)
        u = jax.image.resize(
            u, (u.shape[0], u.shape[1] * 2, u.shape[2] * 2, u.shape[3]),
            method="nearest",
        )
        y26 = jnp.concatenate([u, route], axis=-1)
        y26 = _DarkConv(c // 4, 1, name="head26_sq", **kw)(y26, train)
        y26 = _DarkConv(c // 2, 3, name="head26_pre", **kw)(y26, train)
        head26 = _DarkConv(out_ch, 1, use_bn=False, act=False,
                           name="head26", **kw)(y26, train)
        f32 = jnp.float32
        return head13.astype(f32), head26.astype(f32)


#: anchor masks for the 2-scale tiny model (coarse scale gets the large
#: anchors)
TINY_ANCHOR_MASKS = ((6, 7, 8), (3, 4, 5))

#: the 2-head (strides 32/16) detector classes — they share the
#: TINY_ANCHOR_MASKS decode contract
TINY_FAMILY = (YoloV3Tiny, YoloV3TinyMX)


class YoloV3(nn.Module):
    """Full detector: input (N, S, S, 3) in [0, 1] → 3 raw head tensors
    at strides 32/16/8 (channels = anchors_per_scale × (5 + num_classes))."""

    num_classes: int = 1
    anchors_per_scale: int = 3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out_ch = self.anchors_per_scale * (5 + self.num_classes)
        x = x.astype(self.dtype)
        r52, r26, r13 = Darknet53(name="backbone", **kw)(x, train)

        b13, head13 = _FPNStage(512, out_ch, name="stage13", **kw)(r13, train)

        u = _DarkConv(256, 1, name="up26_conv", **kw)(b13, train)
        u = jax.image.resize(u, (u.shape[0], u.shape[1] * 2, u.shape[2] * 2, u.shape[3]),
                             method="nearest")
        b26, head26 = _FPNStage(
            256, out_ch, name="stage26", **kw
        )(jnp.concatenate([u, r26], axis=-1), train)

        u = _DarkConv(128, 1, name="up52_conv", **kw)(b26, train)
        u = jax.image.resize(u, (u.shape[0], u.shape[1] * 2, u.shape[2] * 2, u.shape[3]),
                             method="nearest")
        _, head52 = _FPNStage(
            128, out_ch, name="stage52", **kw
        )(jnp.concatenate([u, r52], axis=-1), train)

        f32 = jnp.float32
        return head13.astype(f32), head26.astype(f32), head52.astype(f32)
