"""Embedding model assembly: backbone + head → D-dim embedding.

The functional equivalent of the reference's ``bottleneck_network``
builders (reference: deep_insight_face/networks/siamese.py:64-128,
networks/triplet.py:60-146). Siamese/triplet "models" are not separate
graphs here — weight sharing is free in JAX (apply the same params to
each leg), so the pair/triplet towers of the reference
(networks/siamese.py:131-161, networks/triplet.py:154-183) reduce to
vmapped applications of one embedding function + a loss; see
training/.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from deep_insight_face_tpu.config import ModelConfig
from deep_insight_face_tpu.models.backbones import BACKBONES
from deep_insight_face_tpu.models.heads import HEADS
from deep_insight_face_tpu.models.inception import InceptionNN4Small2
from deep_insight_face_tpu.models.layers import l2_normalize


class EmbeddingModel(nn.Module):
    """backbone → head → (optional) l2 normalization."""

    backbone: str = "resnet50v2"
    head: str = "gdc"
    embedding_size: int = 128
    dropout_rate: float = 0.3
    l2_normalized: bool = True
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    width_multiplier: float = 1.0
    norm: str = "batch"
    remat: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.backbone in ("inception_nn4", "inception"):
            # Inception carries its own embedding projection
            # (reference: networks/inceptionv3.py:302-305).
            emb = InceptionNN4Small2(
                embedding_size=self.embedding_size,
                l2_output=False,
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                name="inception",
            )(images, train)
        else:
            backbone_kw: Dict[str, Any] = dict(
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                width=self.width_multiplier,
                remat=self.remat,
            )
            if self.norm != "batch":
                # only mobilenetv2 supports alternate norms (the others
                # keep BatchNorm for weight-port parity) — a TypeError
                # here means the combination is unsupported
                backbone_kw["norm"] = self.norm
            features = BACKBONES[self.backbone](**backbone_kw)(images, train)
            head_cls = HEADS[self.head]
            head_kw: Dict[str, Any] = dict(
                embedding_size=self.embedding_size,
                dropout_rate=self.dropout_rate,
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
            )
            if head_cls is HEADS["gdc"]:
                head_kw["l2_output"] = False  # normalization handled below
                head_kw["norm"] = self.norm
            emb = head_cls(**head_kw, name="head")(features, train)
        emb = emb.astype(jnp.float32)
        return l2_normalize(emb) if self.l2_normalized else emb


def build_embedding_model(cfg: ModelConfig) -> EmbeddingModel:
    return EmbeddingModel(
        backbone=cfg.backbone,
        head=cfg.head,
        embedding_size=cfg.embedding_size,
        dropout_rate=cfg.dropout_rate,
        l2_normalized=cfg.l2_normalize,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype),
        width_multiplier=cfg.width_multiplier,
        norm=cfg.norm,
    )


def init_embedding_params(
    model: EmbeddingModel,
    rng: jax.Array,
    image_size: int = 112,
    channels: int = 3,
) -> Dict:
    """Initialize {params, batch_stats} with a dummy batch."""
    dummy = jnp.zeros((1, image_size, image_size, channels), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    return variables


def embed_fn(model: EmbeddingModel):
    """Jitted inference-mode embedding function over variables+images."""

    @jax.jit
    def _embed(variables, images):
        return model.apply(variables, images, train=False)

    return _embed
