"""Lightweight 68-point facial landmark regressor (PFLD-style).

The reference has NO landmark model of its own — it imports an external
``face_landmark_detector`` package and hard-exits when missing
(reference: deep_insight_face/api.py:17-25). This module closes that gap
natively: a MobileNet-ish backbone with multi-scale feature fusion
regressing 68 normalized (x, y) points (PFLD, arXiv 1902.10859 — listed
in PAPERS.md), jit-friendly and weight-loadable.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from deep_insight_face_tpu.models.layers import ConvBN, Dtype


class LandmarkNet(nn.Module):
    """(N, S, S, 3) float input → (N, 68, 2) landmarks in [0, 1]."""

    num_points: int = 68
    width: float = 1.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        w = lambda c: max(8, int(c * self.width))
        x = x.astype(self.dtype)
        x = ConvBN(w(32), (3, 3), strides=(2, 2), name="stem", **kw)(x, train)
        feats = []
        for i, c in enumerate([64, 128, 256]):
            x = ConvBN(w(c), (3, 3), strides=(2, 2), name=f"down{i}", **kw)(x, train)
            x = ConvBN(w(c), (3, 3), name=f"conv{i}", **kw)(x, train)
            feats.append(jnp.mean(x, axis=(1, 2)))  # multi-scale global pools
        h = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(w(256), name="fc1", **kw)(h)
        h = nn.relu(h)
        pts = nn.Dense(self.num_points * 2, name="points", **kw)(h)
        pts = nn.sigmoid(pts.astype(jnp.float32))  # normalized coords
        return pts.reshape(-1, self.num_points, 2)
