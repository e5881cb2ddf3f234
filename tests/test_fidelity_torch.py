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
