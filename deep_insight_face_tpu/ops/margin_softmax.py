"""Flash margin-softmax (ArcFace/CosFace) — Pallas TPU kernel with
custom VJP.

The BASELINE north star names a "Pallas margin-softmax head". The XLA
formulation (ops/losses.arcface_loss) materializes the full (B, C)
logit matrix in HBM — at face-recognition identity counts (C = 10⁵…10⁷)
that is hundreds of MB per step and caps the per-chip classifier shard.
This kernel streams the classifier in (D, TC) column tiles through VMEM
with an online-softmax accumulator (flash-attention-style rescaling), so
HBM holds only the (B,) loss and the (B, D)/(D, C) gradients:

  forward:  per tile → logits = emb·W_tile (MXU) → combined margin on the
            target column → running max/sum-exp/target accumulators
  backward: recompute logits per tile → p = exp(l − M)/Z →
            demb += (p − onehot·∂margin) · W_tileᵀ, dW_tile = embᵀ · (…)

Composes with the model-parallel sharding in parallel/train_step.py: each
model shard runs the kernel over its identity range.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_insight_face_tpu.ops.pallas_utils import interpret_mode, round_up

_TC = 512  # classifier column tile


import math


def _margin_cos(cos: jnp.ndarray, m1: float, m2: float, m3: float) -> jnp.ndarray:
    """cos(θ + m2) − m3 for m1 == 1 (ArcFace/CosFace), acos-free:
    cosθ·cos m2 − sinθ·sin m2. Mosaic has no acos lowering; m1 ≠ 1
    (SphereFace) stays on the XLA path (ops/losses.arcface_logits)."""
    if m1 != 1.0:
        raise NotImplementedError("flash kernel supports m1 == 1 only")
    c = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    sin = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-12))
    return c * math.cos(m2) - sin * math.sin(m2) - m3


def _margin_dcos(cos: jnp.ndarray, m1: float, m2: float) -> jnp.ndarray:
    """d/dc [c·cos m2 − √(1−c²)·sin m2] = cos m2 + (c/√(1−c²))·sin m2."""
    c = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    sin = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-12))
    return math.cos(m2) + (c / sin) * math.sin(m2)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(m1, m2, m3, scale, n_classes,
                emb_ref, w_ref, label_ref,
                loss_ref, max_ref, z_ref,
                run_max, run_z, run_tgt):
    j = pl.program_id(0)
    tc = w_ref.shape[1]
    b = emb_ref.shape[0]

    logits = jax.lax.dot_general(
        emb_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, TC) cosines
    col = j * tc + jax.lax.broadcasted_iota(jnp.int32, (b, tc), 1)
    labels = label_ref[:, 0:1]  # (B, 1)
    is_target = col == labels
    in_range = col < n_classes

    adjusted = jnp.where(is_target, _margin_cos(logits, m1, m2, m3), logits)
    adjusted = jnp.where(in_range, adjusted * scale, -jnp.inf)

    tile_max = jnp.max(adjusted, axis=1, keepdims=True)  # (B, 1)
    tile_tgt = jnp.sum(jnp.where(is_target, adjusted, 0.0), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        run_max[:] = tile_max
        run_z[:] = jnp.sum(jnp.exp(adjusted - tile_max), axis=1, keepdims=True)
        run_tgt[:] = tile_tgt

    @pl.when(j > 0)
    def _():
        old_max = run_max[:]
        new_max = jnp.maximum(old_max, tile_max)
        run_z[:] = run_z[:] * jnp.exp(old_max - new_max) + jnp.sum(
            jnp.exp(adjusted - new_max), axis=1, keepdims=True
        )
        run_max[:] = new_max
        run_tgt[:] = run_tgt[:] + tile_tgt

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        m = run_max[:]
        z = run_z[:]
        loss_ref[:] = jnp.log(z) + m - run_tgt[:]
        max_ref[:] = m
        z_ref[:] = z


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(m1, m2, m3, scale, n_classes,
                emb_ref, w_ref, label_ref, max_ref, z_ref, g_ref,
                demb_ref, dw_ref, acc):
    j = pl.program_id(0)
    tc = w_ref.shape[1]
    b = emb_ref.shape[0]

    logits = jax.lax.dot_general(
        emb_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = j * tc + jax.lax.broadcasted_iota(jnp.int32, (b, tc), 1)
    labels = label_ref[:, 0:1]
    is_target = col == labels
    in_range = col < n_classes

    adjusted = jnp.where(is_target, _margin_cos(logits, m1, m2, m3), logits)
    scaled = jnp.where(in_range, adjusted * scale, -jnp.inf)
    p = jnp.exp(scaled - max_ref[:]) / z_ref[:]
    p = jnp.where(in_range, p, 0.0)

    # dloss/dlogit (pre-margin cosine): non-target s·p; target s·(p−1)·∂margin
    dmargin = _margin_dcos(logits, m1, m2)
    dcos = jnp.where(
        is_target, (p - 1.0) * scale * dmargin, p * scale
    ) * g_ref[:]  # (B, TC), g broadcast per row

    # dW tile: (D, TC) = embᵀ · dcos
    dw_ref[:] = jax.lax.dot_general(
        emb_ref[:], dcos,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # demb accumulation: (B, D) += dcos · W_tileᵀ
    contrib = jax.lax.dot_general(
        dcos, w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc[:] = contrib

    @pl.when(j > 0)
    def _():
        acc[:] = acc[:] + contrib

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        demb_ref[:] = acc[:]


# ---------------------------------------------------------------------------
# host-side wrappers + custom VJP
# ---------------------------------------------------------------------------


def _pad_operands(emb, w, labels):
    b, d = emb.shape
    c = w.shape[1]
    bp, dp, cp = round_up(b, 8), round_up(d, 128), round_up(c, _TC)
    emb_p = jnp.pad(emb.astype(jnp.float32), ((0, bp - b), (0, dp - d)))
    w_p = jnp.pad(w.astype(jnp.float32), ((0, dp - d), (0, cp - c)))
    lab_p = jnp.pad(labels.astype(jnp.int32), (0, bp - b), constant_values=-1)
    return emb_p, w_p, lab_p, (b, d, c, bp, dp, cp)


def _flash_fwd(emb, w, labels, m1, m2, m3, scale):
    emb_p, w_p, lab_p, (b, d, c, bp, dp, cp) = _pad_operands(emb, w, labels)
    grid = (cp // _TC,)
    loss, mx, z = pl.pallas_call(
        functools.partial(_fwd_kernel, m1, m2, m3, scale, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, dp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, _TC), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bp, 1), jnp.float32),
            pltpu.VMEM((bp, 1), jnp.float32),
            pltpu.VMEM((bp, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(emb_p, w_p, lab_p[:, None])
    return loss[:b, 0], mx, z


def _flash_bwd(emb, w, labels, mx, z, g_rows, m1, m2, m3, scale):
    emb_p, w_p, lab_p, (b, d, c, bp, dp, cp) = _pad_operands(emb, w, labels)
    g_p = jnp.pad(g_rows.astype(jnp.float32), (0, bp - b))[:, None]
    grid = (cp // _TC,)
    demb, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, m1, m2, m3, scale, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, dp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, _TC), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bp, dp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, _TC), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, dp), jnp.float32),
            jax.ShapeDtypeStruct((dp, cp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bp, dp), jnp.float32)],
        interpret=interpret_mode(),
    )(emb_p, w_p, lab_p[:, None], mx, z, g_p)
    return demb[:b, :d], dw[:d, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_arcface_loss(
    emb_n: jnp.ndarray,
    w_n: jnp.ndarray,
    labels: jnp.ndarray,
    margin1: float = 1.0,
    margin2: float = 0.5,
    margin3: float = 0.0,
    scale: float = 64.0,
) -> jnp.ndarray:
    """Mean combined-margin softmax CE over l2-NORMALIZED ``emb_n`` (B, D)
    and ``w_n`` (D, C). Normalize inputs first (XLA differentiates the
    normalization; the kernel handles the (B, C)-sized middle)."""
    loss, _, _ = _flash_fwd(emb_n, w_n, labels, margin1, margin2, margin3, scale)
    return jnp.mean(loss)


def _vjp_fwd(emb_n, w_n, labels, margin1, margin2, margin3, scale):
    loss, mx, z = _flash_fwd(emb_n, w_n, labels, margin1, margin2, margin3, scale)
    return jnp.mean(loss), (emb_n, w_n, labels, mx, z)


def _vjp_bwd(margin1, margin2, margin3, scale, residuals, g):
    emb_n, w_n, labels, mx, z = residuals
    b = emb_n.shape[0]
    g_rows = jnp.full((b,), 1.0 / b) * g
    demb, dw = _flash_bwd(
        emb_n, w_n, labels, mx, z, g_rows, margin1, margin2, margin3, scale
    )
    return demb, dw, None


flash_arcface_loss.defvjp(_vjp_fwd, _vjp_bwd)
