"""Weight converter tests: synthetic Darknet binaries + OpenFace CSVs."""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_insight_face_tpu.models.yolov3 import _DarkConv
from deep_insight_face_tpu.utils import weights as W


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _DarkConv(4, 3, dtype=jnp.float32, name="a")(x, train)
        x = _DarkConv(2, 1, use_bn=False, act=False, dtype=jnp.float32, name="b")(x, train)
        return x


def _write_darknet(path, layers):
    """layers: list of (has_bn, cout, cin, k, dict_of_arrays)"""
    with open(path, "wb") as f:
        f.write(struct.pack("3i", 0, 2, 0))
        f.write(struct.pack("q", 0))  # seen (int64 for version 0.2)
        for has_bn, arrays in layers:
            if has_bn:
                for key in ("beta", "gamma", "mean", "var"):
                    arrays[key].astype(np.float32).tofile(f)
            else:
                arrays["bias"].astype(np.float32).tofile(f)
            arrays["w_oihw"].astype(np.float32).tofile(f)


def test_load_darknet_roundtrip(tmp_path, rng):
    model = _Tiny()
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(jax.random.key(0), x)

    wa = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)  # OIHW
    wb = rng.normal(size=(2, 4, 1, 1)).astype(np.float32)
    layers = [
        (True, dict(beta=rng.normal(size=4), gamma=rng.normal(size=4) + 1,
                    mean=rng.normal(size=4), var=rng.random(4) + 0.5, w_oihw=wa)),
        (False, dict(bias=rng.normal(size=2), w_oihw=wb)),
    ]
    path = tmp_path / "tiny.weights"
    _write_darknet(path, layers)

    order = [(("a",), True), (("b",), False)]
    loaded = W.load_darknet_weights(str(path), variables, order)

    np.testing.assert_allclose(
        np.asarray(loaded["params"]["a"]["conv"]["kernel"]),
        wa.transpose(2, 3, 1, 0), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["b"]["conv"]["kernel"]),
        wb.transpose(2, 3, 1, 0), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["batch_stats"]["a"]["bn"]["mean"]),
        layers[0][1]["mean"], atol=1e-6,
    )
    # loaded model still applies
    y = _Tiny().apply(loaded, x)
    assert y.shape == (1, 8, 8, 2)


def test_load_darknet_wrong_size(tmp_path, rng):
    model = _Tiny()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    path = tmp_path / "bad.weights"
    with open(path, "wb") as f:
        f.write(struct.pack("3i", 0, 2, 0))
        f.write(struct.pack("q", 0))
        np.zeros(10, np.float32).tofile(f)
    with pytest.raises(ValueError):
        W.load_darknet_weights(str(path), variables, [(("a",), True), (("b",), False)])


def test_darknet_yolov3_layer_order_counts():
    order = W.darknet_yolov3_layer_order()
    # darknet yolov3 has 75 conv layers; 3 head convs without BN
    assert len(order) == 75
    assert sum(1 for _, bn in order if not bn) == 3


def test_parse_darknet_cfg(tmp_path):
    cfg = tmp_path / "t.cfg"
    cfg.write_text(
        "[net]\nwidth=416\nheight=416\n\n"
        "[convolutional]\nbatch_normalize=1\nfilters=32\nsize=3\n\n"
        "[shortcut]\nfrom=-3\n\n[convolutional]\nfilters=18\nsize=1\n"
    )
    sections = W.parse_darknet_cfg(str(cfg))
    assert [s["__type__"] for s in sections] == [
        "net", "convolutional", "shortcut", "convolutional",
    ]
    assert sections[1]["batch_normalize"] == "1"
    assert sections[3]["filters"] == "18"


def test_openface_csv_loader(tmp_path, rng):
    """Partial load with the reference's real dump naming: stem conv and
    BN under different base names ('conv1_w' + 'bn1_m', reference
    networks/inceptionv3.py:336-341), OIHW flat → (2,3,1,0) transpose
    (reference :44-45)."""
    from deep_insight_face_tpu.models.inception import InceptionNN4Small2

    model = InceptionNN4Small2(dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))

    w = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)  # OIHW flat csv
    np.savetxt(tmp_path / "conv1_w.csv", w.reshape(64, -1), delimiter=",")
    b = rng.normal(size=64).astype(np.float32)
    np.savetxt(tmp_path / "conv1_b.csv", b[None], delimiter=",")
    bnm = rng.normal(size=64).astype(np.float32)
    np.savetxt(tmp_path / "bn1_m.csv", bnm[None], delimiter=",")

    loaded = W.load_openface_csv(str(tmp_path), variables, module_name="")
    got = np.asarray(loaded["params"]["conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv1"]["conv"]["bias"]), b, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(loaded["batch_stats"]["conv1"]["bn"]["mean"]), bnm, atol=1e-5
    )


def test_openface_csv_strict_raises_on_missing(tmp_path):
    from deep_insight_face_tpu.models.inception import InceptionNN4Small2

    model = InceptionNN4Small2(dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))
    with pytest.raises(FileNotFoundError):
        W.load_openface_csv(str(tmp_path), variables, module_name="",
                            strict=True)


def test_openface_csv_full_roundtrip(tmp_path, rng):
    """Synthetic full-dump roundtrip in the reference's exact format:
    save every layer the way OpenFace dumps it, reload with strict=True,
    and require IDENTICAL embeddings — pins the reshape/transpose/naming
    contract end to end (reference loader: networks/inceptionv3.py:28-60,
    incl. the dense (128, 736)-then-transpose at :53-55)."""
    from deep_insight_face_tpu.models.inception import InceptionNN4Small2

    model = InceptionNN4Small2(dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)))

    # randomize every leaf so a wrong mapping cannot hide behind zeros
    def _rand(path, a):
        name = str(path[-1].key)
        if name == "var":
            return jnp.asarray(rng.uniform(0.8, 1.2, a.shape), a.dtype)
        return jnp.asarray(rng.normal(scale=0.1, size=a.shape), a.dtype)

    variables = jax.tree_util.tree_map_with_path(_rand, variables)

    W.save_openface_csv(str(tmp_path), variables, module_name="")
    fresh = model.init(jax.random.key(1), jnp.zeros((1, 96, 96, 3)))
    loaded = W.load_openface_csv(str(tmp_path), fresh, module_name="",
                                 strict=True)

    # every leaf must round-trip (CSV float32 text ~1e-6 relative)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6, err_msg=str(pa))

    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)).astype(np.float32))
    ya = np.asarray(model.apply(variables, x, train=False))
    yb = np.asarray(model.apply(loaded, x, train=False))
    cos = (ya * yb).sum(-1)  # both l2-normalized
    assert float(cos.min()) >= 0.999


def test_npz_roundtrip(tmp_path, rng):
    tree = {
        "params": {"layer": {"kernel": jnp.array(rng.normal(size=(3, 4)))}},
        "batch_stats": {"layer": {"mean": jnp.zeros(4)}},
    }
    W.save_npz(tmp_path / "w.npz", tree)
    back = W.load_npz(tmp_path / "w.npz")
    np.testing.assert_allclose(
        np.asarray(back["params"]["layer"]["kernel"]),
        np.asarray(tree["params"]["layer"]["kernel"]),
    )


def test_tiny_layer_order_matches_model(rng):
    """Every path in the tiny order exists in a real YoloV3Tiny param tree
    with the right BN presence."""
    from deep_insight_face_tpu.models.yolov3 import YoloV3Tiny

    model = YoloV3Tiny(num_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    params = variables["params"]
    order = W.darknet_yolov3_tiny_layer_order()
    assert len(order) == 13
    assert sum(1 for _, bn in order if not bn) == 2
    for path, has_bn in order:
        node = params
        for p in path:
            assert p in node, f"missing {path}"
            node = node[p]
        assert "conv" in node
        assert ("bn" in node) == has_bn, path
        assert ("bias" in node["conv"]) == (not has_bn), path


def test_tiny_darknet_weights_roundtrip(tmp_path, rng):
    """Synthetic darknet-tiny binary loads end-to-end into YoloV3Tiny."""
    import struct

    from deep_insight_face_tpu.models.yolov3 import YoloV3Tiny

    model = YoloV3Tiny(num_classes=1, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    order = W.darknet_yolov3_tiny_layer_order()

    path = tmp_path / "tiny.weights"
    with open(path, "wb") as f:
        f.write(struct.pack("3i", 0, 2, 0))
        f.write(struct.pack("q", 0))
        for p, has_bn in order:
            node = variables["params"]
            for k in p:
                node = node[k]
            kh, kw, cin, cout = node["conv"]["kernel"].shape
            if has_bn:
                rng.normal(size=cout).astype(np.float32).tofile(f)  # beta
                rng.normal(size=cout).astype(np.float32).tofile(f)  # gamma
                rng.normal(size=cout).astype(np.float32).tofile(f)  # mean
                (rng.random(cout) + 0.5).astype(np.float32).tofile(f)  # var > 0
            else:
                rng.normal(size=cout).astype(np.float32).tofile(f)
            rng.normal(size=(cout, cin, kh, kw)).astype(np.float32).tofile(f)

    loaded = W.load_darknet_weights(str(path), variables, order)
    out = model.apply(loaded, jnp.zeros((1, 128, 128, 3)))
    assert out[0].shape[-1] == 18
    assert np.isfinite(np.asarray(out[0])).all()
