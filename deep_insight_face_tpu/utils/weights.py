"""Weight import tooling.

- Darknet ``.weights`` binary → Flax param tree for the YoloV3 graph
  (working equivalent of the reference's Keras converter,
  reference: scripts/yolo_convert_tf.py:38-234: 5-int32 header, per-conv
  [bn beta, gamma, mean, var] then OIHW conv weights needing a
  (2, 3, 1, 0) transpose to HWIO).
- OpenFace CSV dumps → Inception nn4.small2 params
  (reference loader: deep_insight_face/networks/inceptionv3.py:15-60).
- A generic ``.npz`` round-trip for converted checkpoints.
"""

from __future__ import annotations

import configparser
import io
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

PathTuple = Tuple[str, ...]


# ---------------------------------------------------------------------------
# pytree path helpers
# ---------------------------------------------------------------------------


def _get(tree: Dict, path: PathTuple):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree: Dict, path: PathTuple, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


# ---------------------------------------------------------------------------
# Darknet
# ---------------------------------------------------------------------------


def parse_darknet_cfg(path: str) -> List[Dict[str, str]]:
    """Parse a Darknet .cfg into an ordered list of section dicts
    (sections repeat, so configparser needs uniquified names —
    same problem the reference solves at scripts/yolo_convert_tf.py:19-35)."""
    sections: List[Dict[str, str]] = []
    current: Optional[Dict[str, str]] = None
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            m = re.match(r"\[(\w+)\]", line)
            if m:
                current = {"__type__": m.group(1)}
                sections.append(current)
            elif current is not None and "=" in line:
                k, v = line.split("=", 1)
                current[k.strip()] = v.strip()
    return sections


def darknet_yolov3_layer_order() -> List[Tuple[PathTuple, bool]]:
    """Ordered (module path, has_bn) for every conv in models.yolov3.YoloV3,
    matching the Darknet yolov3 weight-file layer order."""
    order: List[Tuple[PathTuple, bool]] = []

    def conv(*path: str, bn: bool = True):
        order.append((tuple(path), bn))

    conv("backbone", "stem")
    blocks = [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]
    for i, (_, n) in enumerate(blocks):
        conv("backbone", f"down{i}")
        for b in range(n):
            conv("backbone", f"res{i}_{b}", "conv1")
            conv("backbone", f"res{i}_{b}", "conv2")

    def stage(name: str):
        for c in range(5):
            conv(name, f"c{c}")
        conv(name, "pre_head")
        conv(name, "head", bn=False)

    stage("stage13")
    conv("up26_conv")
    stage("stage26")
    conv("up52_conv")
    stage("stage52")
    return order


def darknet_yolov3_tiny_layer_order() -> List[Tuple[PathTuple, bool]]:
    """Ordered (module path, has_bn) for models.yolov3.YoloV3Tiny, matching
    the Darknet yolov3-tiny weight-file layer order (13 convs, heads
    without BN)."""
    order: List[Tuple[PathTuple, bool]] = []
    for i in range(5):
        order.append(((f"conv{i}",), True))
    order.extend(
        [
            (("conv5",), True),
            (("conv6",), True),
            (("conv7",), True),
            (("head13_pre",), True),
            (("head13",), False),
            (("up_conv",), True),
            (("head26_pre",), True),
            (("head26",), False),
        ]
    )
    return order


def load_darknet_weights(
    weights_path: str,
    variables: Dict,
    layer_order: Optional[List[Tuple[PathTuple, bool]]] = None,
) -> Dict:
    """Fill a Flax variables tree ({'params', 'batch_stats'}) from a
    Darknet binary. Returns a new tree; raises if byte counts mismatch."""
    layer_order = layer_order or darknet_yolov3_layer_order()
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))

    with open(weights_path, "rb") as f:
        major, minor, _rev = np.fromfile(f, np.int32, 3)
        if major * 10 + minor >= 2:
            np.fromfile(f, np.int64, 1)  # images seen
        else:
            np.fromfile(f, np.int32, 1)
        blob = np.fromfile(f, np.float32)

    pos = 0

    def take(n: int) -> np.ndarray:
        nonlocal pos
        if pos + n > blob.size:
            raise ValueError(
                f"darknet weight file exhausted: need {n} floats at {pos}, "
                f"have {blob.size}"
            )
        out = blob[pos : pos + n]
        pos += n
        return out

    for path, has_bn in layer_order:
        kernel = _get(params, path + ("conv", "kernel"))
        kh, kw, cin, cout = kernel.shape
        if has_bn:
            beta = take(cout)
            gamma = take(cout)
            mean = take(cout)
            var = take(cout)
            _set(params, path + ("bn", "bias"), jnp.asarray(beta))
            _set(params, path + ("bn", "scale"), jnp.asarray(gamma))
            _set(stats, path + ("bn", "mean"), jnp.asarray(mean))
            _set(stats, path + ("bn", "var"), jnp.asarray(var))
        else:
            bias = take(cout)
            _set(params, path + ("conv", "bias"), jnp.asarray(bias))
        w = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
        _set(params, path + ("conv", "kernel"), jnp.asarray(w.transpose(2, 3, 1, 0)))

    if pos != blob.size:
        raise ValueError(f"{blob.size - pos} unused floats in darknet weight file")
    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# OpenFace CSV → Inception nn4.small2
# ---------------------------------------------------------------------------

# The reference's CSV dump naming (networks/inceptionv3.py:336-362 WEIGHTS
# list): the stem pairs conv and BN under DIFFERENT base names
# ('conv1' + 'bn1'); each block branch uses '<block>_<branch>_conv<n>' +
# '<block>_<branch>_bn<n>' (n = 1 reduce / 2 main for 3x3 & 5x5, bare for
# pool/1x1); the head is 'dense_layer' read from dense_{w,b}.csv.
# Files per conv: <conv>_w.csv (flat OIHW), <conv>_b.csv.
# Files per bn:   <bn>_{w,b,m,v}.csv → scale/bias/mean/var.

# our InceptionBlock branch module names, keyed by csv branch fragment
_OPENFACE_BRANCHES = [
    ("3x3_conv1", "3x3_bn1", "three_reduce"),
    ("3x3_conv2", "3x3_bn2", "three"),
    ("5x5_conv1", "5x5_bn1", "five_reduce"),
    ("5x5_conv2", "5x5_bn2", "five"),
    ("pool_conv", "pool_bn", "pool_proj"),
    ("1x1_conv", "1x1_bn", "one"),
]


def openface_csv_layer_map(params: Dict) -> List[Tuple[str, str, PathTuple]]:
    """(conv csv base, bn csv base, module path) for every ConvBN the
    model has — derived from the param tree so blocks without a branch
    (e.g. 3c has no 1×1) are skipped exactly as the reference's WEIGHTS
    list skips them."""
    out: List[Tuple[str, str, PathTuple]] = []
    for i in (1, 2, 3):
        out.append((f"conv{i}", f"bn{i}", (f"conv{i}",)))
    for block in ["3a", "3b", "3c", "4a", "4e", "5a", "5b"]:
        mod = f"inception_{block}"
        for conv_frag, bn_frag, ours in _OPENFACE_BRANCHES:
            if ours in params.get(mod, {}):
                out.append((f"{mod}_{conv_frag}", f"{mod}_{bn_frag}", (mod, ours)))
    return out


def load_openface_csv(
    csv_dir: str, variables: Dict, module_name: str = "inception",
    strict: bool = False,
) -> Dict:
    """Load OpenFace CSV weight dumps into an InceptionNN4Small2 tree.

    Mirrors the reference loader exactly
    (networks/inceptionv3.py:28-60): conv ``<name>_w.csv`` holds the
    flattened OIHW tensor (reshaped to conv_shape then transposed
    (2,3,1,0) to HWIO, reference :44-45), ``<name>_b.csv`` the bias; BN
    ``<name>_{w,b,m,v}.csv`` are scale/bias/mean/var; ``dense_w.csv`` is
    reshaped (128, 736) and TRANSPOSED to Keras (in, out) order
    (reference :53-55).

    ``strict=True`` raises FileNotFoundError on any missing layer file;
    the default skips absent layers (partial loads allowed).
    """
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    root = (module_name,) if module_name else ()
    tree = _get(params, root)

    def csv(name: str, required: bool) -> Optional[np.ndarray]:
        p = os.path.join(csv_dir, name + ".csv")
        if not os.path.exists(p):
            if required and strict:
                raise FileNotFoundError(f"OpenFace CSV dump missing {p}")
            return None
        return np.genfromtxt(p, delimiter=",", dtype=np.float32).ravel()

    for conv_base, bn_base, path in openface_csv_layer_map(tree):
        w = csv(conv_base + "_w", required=True)
        if w is not None:
            kernel = _get(params, root + path + ("conv", "kernel"))
            kh, kw_, cin, cout = kernel.shape
            # flat OIHW → (O, I, H, W) → transpose (2,3,1,0) → HWIO
            # (reference :44-45 via its conv_shape dict, here derived)
            _set(params, root + path + ("conv", "kernel"),
                 jnp.asarray(w.reshape(cout, cin, kh, kw_).transpose(2, 3, 1, 0)))
        b = csv(conv_base + "_b", required=True)
        if b is not None:
            _set(params, root + path + ("conv", "bias"), jnp.asarray(b))
        for suffix, coll, leaf in [
            ("_w", params, ("bn", "scale")),
            ("_b", params, ("bn", "bias")),
            ("_m", stats, ("bn", "mean")),
            ("_v", stats, ("bn", "var")),
        ]:
            arr = csv(bn_base + suffix, required=True)
            if arr is not None:
                _set(coll, root + path + leaf, jnp.asarray(arr))

    dw = csv("dense_w", required=True)
    if dw is not None:
        dense = _get(params, root + ("dense",))
        in_dim, out_dim = dense["kernel"].shape
        # the dump is (out, in) row-major; the reference reshapes to
        # (128, 736) then transposes (reference :53-55)
        dense["kernel"] = jnp.asarray(dw.reshape(out_dim, in_dim).T)
        db = csv("dense_b", required=True)
        if db is not None:
            dense["bias"] = jnp.asarray(db)

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


def save_openface_csv(
    csv_dir: str, variables: Dict, module_name: str = "inception"
) -> None:
    """Write an InceptionNN4Small2 tree as an OpenFace-format CSV dump —
    the inverse of :func:`load_openface_csv`, byte-layout-compatible with
    the dumps the reference loads (networks/inceptionv3.py:28-60). Used
    to pin the format contract in tests (synthetic roundtrip)."""
    os.makedirs(csv_dir, exist_ok=True)
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    root = (module_name,) if module_name else ()
    tree = _get(params, root)

    def dump(name: str, arr: np.ndarray):
        np.savetxt(os.path.join(csv_dir, name + ".csv"),
                   np.asarray(arr, np.float32).ravel()[None], delimiter=",")

    for conv_base, bn_base, path in openface_csv_layer_map(tree):
        kernel = np.asarray(_get(params, root + path + ("conv", "kernel")))
        dump(conv_base + "_w", kernel.transpose(3, 2, 0, 1))  # HWIO → OIHW flat
        dump(conv_base + "_b", _get(params, root + path + ("conv", "bias")))
        dump(bn_base + "_w", _get(params, root + path + ("bn", "scale")))
        dump(bn_base + "_b", _get(params, root + path + ("bn", "bias")))
        dump(bn_base + "_m", _get(stats, root + path + ("bn", "mean")))
        dump(bn_base + "_v", _get(stats, root + path + ("bn", "var")))

    dense = _get(params, root + ("dense",))
    dump("dense_w", np.asarray(dense["kernel"]).T)  # (in, out) → (out, in) flat
    dump("dense_b", dense["bias"])


# ---------------------------------------------------------------------------
# npz round-trip
# ---------------------------------------------------------------------------


def save_npz(path: str, variables: Dict, dtype: Optional[str] = None) -> None:
    """Flatten a variables pytree into one compressed npz.

    ``dtype="float16"`` stores float leaves half-precision — used for
    shipped inference weights (params round-trip through f16 with ~1e-3
    relative error, irrelevant at inference); load_npz restores float32.
    ``batch_stats`` leaves are always kept float32: BatchNorm running
    variances can sit below f16's subnormal range (~6e-5) and flushing
    them toward zero skews eval-mode normalization.
    """
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(variables)[0]
    for key_path, leaf in leaves:
        name = "/".join(str(getattr(k, "key", k)) for k in key_path)
        arr = np.asarray(leaf)
        if (dtype is not None and np.issubdtype(arr.dtype, np.floating)
                and not name.startswith("batch_stats/")):
            arr = arr.astype(dtype)
        flat[name] = arr
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> Dict:
    data = np.load(path)
    tree: Dict = {}
    for name in data.files:
        arr = data[name]
        if arr.dtype == np.float16:  # shipped-weight compression
            arr = arr.astype(np.float32)
        _set(tree, tuple(name.split("/")), jnp.asarray(arr))
    return tree
