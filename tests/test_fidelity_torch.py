"""Cross-framework fidelity: the Flax ResNetV2 vs an independent torch
implementation with IDENTICAL weights.

The BASELINE fidelity target (embeddings matching the TF2 reference at
cos ≥ 0.999) cannot be checked directly here — TF is absent and the
reference model is unbuildable (SURVEY §0). This is the strongest
available proxy: an independently-written PyTorch pre-activation
bottleneck network, fed the same ported weights, must agree with the
Flax graph to float tolerance. Any convention slip (padding asymmetry,
BN epsilon, stride placement, HWIO↔OIHW transposes) breaks it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from deep_insight_face_tpu.models.backbones import ResNetV2  # noqa: E402


def _to_torch_conv(kernel):
    # HWIO → OIHW
    return torch.tensor(np.asarray(kernel).transpose(3, 2, 0, 1))


def _torch_conv(x, kernel, bias=None, stride=1, padding=0):
    w = _to_torch_conv(kernel)
    b = torch.tensor(np.asarray(bias)) if bias is not None else None
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def _torch_bn(x, p, s, eps=1.001e-5):
    scale = torch.tensor(np.asarray(p["scale"]))
    bias = torch.tensor(np.asarray(p["bias"]))
    mean = torch.tensor(np.asarray(s["mean"]))
    var = torch.tensor(np.asarray(s["var"]))
    return F.batch_norm(x, mean, var, scale, bias, training=False, eps=eps)


def _torch_block(x, p, s, stride, project):
    pre = F.relu(_torch_bn(x, p["preact_bn"], s["preact_bn"]))
    if project:
        shortcut = _torch_conv(pre, p["shortcut_conv"]["kernel"],
                               p["shortcut_conv"]["bias"], stride=stride)
    elif stride > 1:
        # 1×1 max-pool with stride == strided subsampling
        shortcut = x[:, :, ::stride, ::stride]
    else:
        shortcut = x
    y = _torch_conv(pre, p["conv1"]["kernel"])
    y = F.relu(_torch_bn(y, p["bn1"], s["bn1"]))
    y = _torch_conv(y, p["conv2"]["kernel"], stride=stride, padding=1)
    y = F.relu(_torch_bn(y, p["bn2"], s["bn2"]))
    y = _torch_conv(y, p["conv3"]["kernel"], p["conv3"]["bias"])
    return shortcut + y


def _torch_resnetv2(x_nhwc, params, stats, depths, filters):
    x = torch.tensor(x_nhwc.transpose(0, 3, 1, 2))
    x = _torch_conv(x, params["stem_conv"]["kernel"],
                    params["stem_conv"]["bias"], stride=2, padding=3)
    x = F.max_pool2d(F.pad(x, (1, 1, 1, 1), value=0.0), 3, stride=2)  # Keras zero-pads
    n_stages = len(depths)
    for stage, depth in enumerate(depths):
        for block in range(depth):
            name = f"stage{stage + 2}_block{block + 1}"
            is_last = block == depth - 1
            stride = 2 if (is_last and stage < n_stages - 1) else 1
            x = _torch_block(x, params[name], stats[name], stride, block == 0)
    x = F.relu(_torch_bn(x, params["post_bn"], stats["post_bn"]))
    return x.permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# VGG16 (Keras-applications graph, reference backbone menu
# networks/triplet.py:92-95 'vgg16')
# ---------------------------------------------------------------------------


def test_vgg16_matches_torch(rng):
    from deep_insight_face_tpu.models.backbones import VGG16

    model = VGG16(dtype=jnp.float32)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    flax_out = np.asarray(model.apply(variables, jnp.asarray(x)))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    with torch.no_grad():
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        for b, (convs, _) in enumerate(model.blocks):
            for c in range(convs):
                w = p[f"block{b + 1}_conv{c + 1}"]
                t = F.relu(_torch_conv(t, w["kernel"], w["bias"], padding=1))
            t = F.max_pool2d(t, 2, stride=2)
        torch_out = t.permute(0, 2, 3, 1).numpy()

    assert flax_out.shape == torch_out.shape
    np.testing.assert_allclose(flax_out, torch_out, atol=2e-4)
    a, b = flax_out.ravel(), torch_out.ravel()
    assert np.linalg.norm(a) > 1e-3
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos >= 0.999


# ---------------------------------------------------------------------------
# Inception nn4.small2 (reference graph: networks/inceptionv3.py:63-309)
# ---------------------------------------------------------------------------


def _torch_convbn(x, p, s, stride=1, pad=((0, 0), (0, 0)), eps=1e-5):
    """ZeroPadding2D + VALID conv (bias) + BN(eps) + relu — the reference's
    conv2d_bn cell (networks/inceptionv3.py:310-334)."""
    (t, b), (l, r) = pad
    x = F.pad(x, (l, r, t, b))
    x = _torch_conv(x, p["conv"]["kernel"], p["conv"]["bias"], stride=stride)
    x = _torch_bn(x, p["bn"], s["bn"], eps=eps)
    return F.relu(x)


def _torch_lrn(x, radius=5, bias=1.0, alpha=1e-4, beta=0.75):
    """tf.nn.lrn semantics (plain windowed sum of squares, NOT torch's
    size-normalized alpha) — reference networks/inceptionv3.py:95."""
    sq = x * x
    c = x.shape[1]
    padded = F.pad(sq, (0, 0, 0, 0, radius, radius))
    acc = torch.zeros_like(x)
    for i in range(2 * radius + 1):
        acc = acc + padded[:, i : i + c]
    return x / (bias + alpha * acc) ** beta


def _torch_zeropad(x, pad):
    (t, b), (l, r) = pad
    return F.pad(x, (l, r, t, b))


def _torch_inception_block(x, p, s, spec):
    """spec: dict with keys mirroring the reference block wiring."""
    branches = []
    stride = spec.get("stride", 1)
    if "three" in p:
        b = _torch_convbn(x, p["three_reduce"], s["three_reduce"])
        b = _torch_convbn(b, p["three"], s["three"], stride=stride,
                          pad=((1, 1), (1, 1)))
        branches.append(b)
    if "five" in p:
        b = _torch_convbn(x, p["five_reduce"], s["five_reduce"])
        b = _torch_convbn(b, p["five"], s["five"], stride=stride,
                          pad=((2, 2), (2, 2)))
        branches.append(b)
    if spec["pool"] == "l2":
        # x² → avgpool3/3 VALID → ×9 → sqrt (reference :160-163)
        pool = torch.sqrt(torch.clamp(
            F.avg_pool2d(x * x, 3, stride=3) * 9.0, min=1e-12))
    else:
        pool = F.max_pool2d(x, 3, stride=2)
    if "pool_proj" in p:
        pool = _torch_convbn(pool, p["pool_proj"], s["pool_proj"])
    branches.append(_torch_zeropad(pool, spec["pool_pad"]))
    if "one" in p:
        branches.append(_torch_convbn(x, p["one"], s["one"]))
    return torch.cat(branches, dim=1)


_NN4_SPECS = {
    "inception_3a": dict(pool="max", pool_pad=((3, 4), (3, 4))),
    "inception_3b": dict(pool="l2", pool_pad=((4, 4), (4, 4))),
    "inception_3c": dict(pool="max", pool_pad=((0, 1), (0, 1)), stride=2),
    "inception_4a": dict(pool="l2", pool_pad=((2, 2), (2, 2))),
    "inception_4e": dict(pool="max", pool_pad=((0, 1), (0, 1)), stride=2),
    "inception_5a": dict(pool="l2", pool_pad=((1, 1), (1, 1))),
    "inception_5b": dict(pool="max", pool_pad=((1, 1), (1, 1))),
}


def _torch_nn4_small2(x_nhwc, params, stats):
    x = torch.tensor(x_nhwc.transpose(0, 3, 1, 2))
    # stem (reference :95-113)
    x = _torch_convbn(x, params["conv1"], stats["conv1"], stride=2,
                      pad=((3, 3), (3, 3)))
    x = F.max_pool2d(F.pad(x, (1, 1, 1, 1)), 3, stride=2)
    x = _torch_lrn(x)
    x = _torch_convbn(x, params["conv2"], stats["conv2"])
    x = _torch_convbn(x, params["conv3"], stats["conv3"], pad=((1, 1), (1, 1)))
    x = _torch_lrn(x)
    x = F.max_pool2d(F.pad(x, (1, 1, 1, 1)), 3, stride=2)
    for name, spec in _NN4_SPECS.items():
        x = _torch_inception_block(x, params[name], stats[name], spec)
    x = x.mean(dim=(2, 3))  # avgpool3/1 VALID on 3×3 ≡ global mean (:302)
    w = torch.tensor(np.asarray(params["dense"]["kernel"]))  # (in, out)
    b = torch.tensor(np.asarray(params["dense"]["bias"]))
    x = x @ w + b
    return F.normalize(x, dim=1).numpy()


def _randomized_variables(model, rng, shape):
    """Init then mildly randomize batch stats (see resnet test note)."""
    variables = model.init(jax.random.key(0), jnp.zeros(shape))

    def _rand_stats(path, a):
        name = str(path[-1].key)
        if name == "mean":
            return jnp.asarray(rng.normal(scale=0.05, size=a.shape), a.dtype)
        return jnp.asarray(rng.uniform(0.8, 1.2, a.shape), a.dtype)

    stats = jax.tree_util.tree_map_with_path(
        _rand_stats, variables["batch_stats"]
    )
    return {"params": variables["params"], "batch_stats": stats}


def test_inception_nn4_small2_matches_torch(rng):
    from deep_insight_face_tpu.models.inception import InceptionNN4Small2

    model = InceptionNN4Small2(dtype=jnp.float32)
    variables = _randomized_variables(model, rng, (1, 96, 96, 3))
    x = rng.normal(size=(2, 96, 96, 3)).astype(np.float32)

    flax_out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        torch_out = _torch_nn4_small2(
            x,
            jax.tree_util.tree_map(np.asarray, variables["params"]),
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
        )
    assert flax_out.shape == torch_out.shape == (2, 128)
    np.testing.assert_allclose(flax_out, torch_out, atol=2e-4)
    cos = (flax_out * torch_out).sum(-1)  # both rows l2-normalized
    assert float(cos.min()) >= 0.999


# ---------------------------------------------------------------------------
# MobileNetV2 (Keras-applications graph the reference builds via
# networks/siamese.py:81-89 / triplet.py:87-100 'mobilenet')
# ---------------------------------------------------------------------------


def _torch_keras_bn(x, p, s, eps=1e-3):
    return _torch_bn(x, p, s, eps=eps)


def _torch_pad_pairs(x, pairs):
    (t, b), (l, r) = pairs
    return F.pad(x, (l, r, t, b))


def _torch_dw_conv(x, kernel, stride, pad):
    # HWIO depthwise kernel has I == 1 groups == channels: HWIO → (C,1,H,W)
    k = torch.tensor(np.asarray(kernel).transpose(3, 2, 0, 1))
    x = _torch_pad_pairs(x, pad)
    return F.conv2d(x, k, stride=stride, groups=k.shape[0])


def _same_pad(size, k=3):
    # SAME for stride 1, odd kernel
    return ((k // 2, k // 2), (k // 2, k // 2))


def _keras_correct_pad(hw, k=3):
    return [((k % 2) if (s % 2) else 0, k % 2) for s in hw]


def _torch_inverted_residual(x, p, s, stride, expand, features):
    inp = x.shape[1]
    y = x
    if expand != 1:
        y = _torch_conv(y, p["expand"]["conv"]["kernel"])
        y = F.relu6(_torch_keras_bn(y, p["expand"]["bn"], s["expand"]["bn"]))
    pad = (_same_pad(None) if stride == 1
           else _keras_correct_pad(y.shape[2:4]))
    y = _torch_dw_conv(y, p["dw_conv"]["kernel"], stride, pad)
    y = F.relu6(_torch_keras_bn(y, p["dw_bn"], s["dw_bn"]))
    y = _torch_conv(y, p["project"]["conv"]["kernel"])
    y = _torch_keras_bn(y, p["project"]["bn"], s["project"]["bn"])
    if stride == 1 and inp == features:
        y = y + x
    return y


def test_mobilenetv2_matches_torch(rng):
    from deep_insight_face_tpu.models.backbones import (
        MobileNetV2, _make_divisible,
    )

    width = 1.0
    model = MobileNetV2(width=width, dtype=jnp.float32)
    variables = _randomized_variables(model, rng, (1, 32, 32, 3))
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    flax_out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    with torch.no_grad():
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        t = _torch_pad_pairs(t, _keras_correct_pad(t.shape[2:4]))
        t = _torch_conv(t, p["stem"]["conv"]["kernel"], stride=2)
        t = F.relu6(_torch_keras_bn(t, p["stem"]["bn"], s["stem"]["bn"]))
        for i, (expand, features, repeats, stride) in enumerate(model.config):
            feats = _make_divisible(features * width)
            for r in range(repeats):
                name = f"block{i}_{r}"
                t = _torch_inverted_residual(
                    t, p[name], s[name],
                    stride if r == 0 else 1, expand, feats,
                )
        t = _torch_conv(t, p["head_conv"]["conv"]["kernel"])
        t = F.relu6(_torch_keras_bn(t, p["head_conv"]["bn"],
                                    s["head_conv"]["bn"]))
        torch_out = t.permute(0, 2, 3, 1).numpy()

    assert flax_out.shape == torch_out.shape
    np.testing.assert_allclose(flax_out, torch_out, atol=5e-4)
    a, b = flax_out.ravel(), torch_out.ravel()
    assert np.linalg.norm(a) > 1e-3
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos >= 0.999


def test_resnetv2_matches_torch(rng):
    depths, filters = (1, 1), (8, 16)
    model = ResNetV2(depths=depths, filters=filters, dtype=jnp.float32)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x))

    # randomize batch stats MILDLY so BN does real work without driving
    # every activation negative (which would zero the final ReLU and make
    # the comparison vacuous): means ~N(0, 0.05), vars ~U(0.8, 1.2)
    def _rand_stats(path, a):
        name = str(path[-1].key)
        if name == "mean":
            return jnp.asarray(rng.normal(scale=0.05, size=a.shape), a.dtype)
        return jnp.asarray(rng.uniform(0.8, 1.2, a.shape), a.dtype)

    stats = jax.tree_util.tree_map_with_path(
        _rand_stats, variables["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    flax_out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        torch_out = _torch_resnetv2(
            x,
            jax.tree_util.tree_map(np.asarray, variables["params"]),
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
            depths, filters,
        )
    assert flax_out.shape == torch_out.shape
    np.testing.assert_allclose(flax_out, torch_out, atol=2e-4)
    # cosine similarity of flattened features ≥ 0.999 (the BASELINE bar);
    # guard against a vacuous all-zero comparison
    a, b = flax_out.ravel(), torch_out.ravel()
    assert np.linalg.norm(a) > 1e-3, "flax output collapsed to zero"
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos >= 0.999
