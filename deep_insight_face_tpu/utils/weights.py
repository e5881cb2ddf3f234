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

# (csv base name, our module path under params['inception'])
_OPENFACE_STEM = [
    ("conv1", ("conv1",)),
    ("conv2", ("conv2",)),
    ("conv3", ("conv3",)),
]

_OPENFACE_BLOCK_BRANCHES = {
    "1x1": "one",
    "3x3_reduce": "three_reduce",  # csv conv1 of the 3x3 branch
    "3x3": "three",
    "5x5_reduce": "five_reduce",
    "5x5": "five",
    "pool_proj": "pool_proj",
}


def load_openface_csv(
    csv_dir: str, variables: Dict, module_name: str = "inception"
) -> Dict:
    """Load OpenFace CSV weight dumps into an InceptionNN4Small2 tree.

    CSV layout per layer (reference: networks/inceptionv3.py:15-60):
    ``<name>_w.csv`` conv weights in OIHW (transposed (2,3,1,0) to HWIO),
    ``<name>_b.csv`` bias; BN layers ``<name>_bn_{w,b,m,v}.csv`` for
    scale/bias/mean/var; ``dense_{w,b}.csv`` for the final projection.
    Missing files are skipped (partial loads allowed).
    """
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    root = (module_name,) if module_name else ()

    def csv(name: str) -> Optional[np.ndarray]:
        p = os.path.join(csv_dir, name + ".csv")
        if not os.path.exists(p):
            return None
        return np.genfromtxt(p, delimiter=",", dtype=np.float32)

    def load_convbn(csv_base: str, path: PathTuple):
        w = csv(csv_base + "_w")
        if w is None:
            return
        kernel = _get(params, root + path + ("conv", "kernel"))
        _set(params, root + path + ("conv", "kernel"),
             jnp.asarray(w.reshape([kernel.shape[3], kernel.shape[2],
                                    kernel.shape[0], kernel.shape[1]])
                         .transpose(2, 3, 1, 0)))
        b = csv(csv_base + "_b")
        if b is not None and "bias" in _get(params, root + path + ("conv",)):
            _set(params, root + path + ("conv", "bias"), jnp.asarray(b))
        for suffix, coll, leaf in [
            ("_bn_w", params, ("bn", "scale")),
            ("_bn_b", params, ("bn", "bias")),
            ("_bn_m", stats, ("bn", "mean")),
            ("_bn_v", stats, ("bn", "var")),
        ]:
            arr = csv(csv_base + suffix)
            if arr is not None:
                _set(coll, root + path + leaf, jnp.asarray(arr))

    for base, path in _OPENFACE_STEM:
        load_convbn(base, path)

    for block in ["3a", "3b", "3c", "4a", "4e", "5a", "5b"]:
        for csv_branch, ours in _OPENFACE_BLOCK_BRANCHES.items():
            load_convbn(f"inception_{block}_{csv_branch}", (f"inception_{block}", ours))

    dw = csv("dense_w")
    if dw is not None:
        dense = _get(params, root + ("dense",))
        dense["kernel"] = jnp.asarray(dw.reshape(dense["kernel"].shape))
        db = csv("dense_b")
        if db is not None:
            dense["bias"] = jnp.asarray(db)

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


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
