"""Distance / similarity primitives, including the blocked Pallas gallery
matcher.

Replaces the reference's per-identity numpy loops
(reference: deep_insight_face/predictions.py:74-79 — a Python loop of
``np.linalg.norm`` per gallery entry) with:

- vectorized pairwise distance matrices for batch mining, using the
  stable ``‖a‖² + ‖b‖² − 2ab`` form the reference *intended*
  (its pairwise_distance drops the cross term due to a statement-split
  bug, reference: common/losses.py:180-183 — we implement the correct
  math and document the divergence);
- a single fused Pallas kernel for gallery matching: blocked ``Q·Gᵀ`` on
  the MXU with a running max+argmax across gallery tiles, so the full
  (M, N) score matrix never hits HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_insight_face_tpu.ops.pallas_utils import cdiv, interpret_mode, pad_dim


# ---------------------------------------------------------------------------
# dense pairwise ops (XLA fuses these fine; no kernel needed)
# ---------------------------------------------------------------------------


def euclidean_distance(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Row-wise euclidean distance with an epsilon floor
    (reference: networks/siamese.py:22-24)."""
    d = jnp.sum(jnp.square(x - y), axis=-1)
    return jnp.sqrt(jnp.maximum(d, eps))


def pairwise_sq_euclidean(
    a: jnp.ndarray, b: Optional[jnp.ndarray] = None, zero_diagonal: bool = False
) -> jnp.ndarray:
    """(N, M) matrix of squared euclidean distances via ‖a‖²+‖b‖²−2ab."""
    b = a if b is None else b
    a2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    b2 = jnp.sum(jnp.square(b), axis=-1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    d = jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)
    if zero_diagonal:
        d = d * (1.0 - jnp.eye(d.shape[0], d.shape[1], dtype=d.dtype))
    return d


def pairwise_cosine_similarity(
    a: jnp.ndarray, b: Optional[jnp.ndarray] = None, eps: float = 1e-12
) -> jnp.ndarray:
    """(N, M) cosine similarity matrix over l2-normalized rows
    (reference: common/losses.py:39-40)."""
    b = a if b is None else b
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.dot(an, bn.T, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# blocked Pallas gallery matcher
# ---------------------------------------------------------------------------

_TM = 128  # query tile
_TN = 128  # gallery tile


def _gallery_score_kernel(q_ref, g_ref, out_ref):
    """One (TM, TN) tile of Q·Gᵀ on the MXU."""
    out_ref[:] = jax.lax.dot_general(
        q_ref[:],
        g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gallery_argmax_kernel(n_actual: int, q_ref, g_ref, max_ref, idx_ref):
    """Running max/argmax over gallery tiles for one query tile.

    Grid is (query_tiles, gallery_tiles) with the gallery dimension
    innermost; the output block for a query tile is revisited across
    gallery steps, accumulating the best score seen so far.
    """
    j = pl.program_id(1)
    tn = g_ref.shape[0]
    scores = jax.lax.dot_general(
        q_ref[:],
        g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, TN)
    col = j * tn + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_actual, scores, -jnp.inf)
    tile_max = jnp.max(scores, axis=1, keepdims=True)
    tile_arg = (j * tn + jnp.argmax(scores, axis=1).astype(jnp.int32))[:, None]

    @pl.when(j == 0)
    def _():
        max_ref[:] = tile_max
        idx_ref[:] = tile_arg

    @pl.when(j > 0)
    def _():
        better = tile_max > max_ref[:]
        idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])
        max_ref[:] = jnp.maximum(tile_max, max_ref[:])


def _normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _compute_dtype(gallery: jnp.ndarray):
    """bf16 galleries contract on the MXU in bf16 (f32 accumulation) —
    half the HBM feed bytes; everything else computes f32."""
    return jnp.bfloat16 if gallery.dtype == jnp.bfloat16 else jnp.float32


@functools.partial(jax.jit, static_argnames=("normalize",))
def gallery_scores(
    queries: jnp.ndarray, gallery: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """Full (M, N) cosine-score matrix via the blocked Pallas matmul.

    Use when the caller needs all scores (e.g. top-k re-ranking); for
    best-match-only use :func:`gallery_match` which never materializes
    the matrix.
    """
    cd = _compute_dtype(gallery)
    if normalize:
        queries, gallery = _normalize(queries), _normalize(gallery)
    m, d = queries.shape
    n = gallery.shape[0]
    qp = pad_dim(pad_dim(queries.astype(cd), 0, _TM), 1, 128)
    gp = pad_dim(pad_dim(gallery.astype(cd), 0, _TN), 1, 128)
    mp, dp = qp.shape
    np_ = gp.shape[0]

    out = pl.pallas_call(
        _gallery_score_kernel,
        grid=(mp // _TM, np_ // _TN),
        in_specs=[
            pl.BlockSpec((_TM, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=interpret_mode(),
    )(qp, gp)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("normalize",))
def gallery_match(
    queries: jnp.ndarray, gallery: jnp.ndarray, normalize: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best gallery match per query: (scores (M,), indices (M,)).

    Fused blocked matmul + running argmax; HBM traffic is O(M·D + N·D),
    independent of the (M, N) score matrix size.
    """
    cd = _compute_dtype(gallery)
    if normalize:
        queries, gallery = _normalize(queries), _normalize(gallery)
    m, d = queries.shape
    n = gallery.shape[0]
    qp = pad_dim(pad_dim(queries.astype(cd), 0, _TM), 1, 128)
    gp = pad_dim(pad_dim(gallery.astype(cd), 0, _TN), 1, 128)
    mp, dp = qp.shape
    np_ = gp.shape[0]

    best, idx = pl.pallas_call(
        functools.partial(_gallery_argmax_kernel, n),
        grid=(mp // _TM, np_ // _TN),
        in_specs=[
            pl.BlockSpec((_TM, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ),
        interpret=interpret_mode(),
    )(qp, gp)
    return best[:m, 0], idx[:m, 0]


# ---------------------------------------------------------------------------
# sharded gallery matcher (SURVEY §5 long-axis: O(N·D) over the mesh)
# ---------------------------------------------------------------------------
#
# The reference's gallery is a per-identity numpy loop on one host
# (reference: predictions.py:74-79,126). The fused kernel above removes
# the loop; these shard_map wrappers remove the single-device capacity
# wall: gallery rows are sharded over the ``model`` mesh axis (each
# device holds N/n_model identities in HBM), queries over ``data``.
# Each shard runs the same fused Pallas kernel on its slice; per-shard
# (max, argmax) combine across ``model`` with a pmax + index-offset
# pmin tie-break.
#
# Padding contract (exactness): callers pad the gallery to a multiple of
# the model-axis size with DUPLICATES OF ROW 0 (see FaceGallery._gallery).
# A duplicate row can tie but never strictly beat the true best: if it
# ties globally, row 0's own shard reports the same score and the pmin
# tie-break returns the genuine (smaller) index; otherwise the padded
# shard's candidate is discarded by the ``best >= global_best`` mask. So
# the returned index is always < N with no n_actual plumbing per shard.


def make_sharded_gallery_match(mesh, data_axis=None, model_axis=None):
    """Build a jitted (queries, gallery) → (scores, indices) matcher
    sharded over ``mesh``.

    ``queries``: (M, D) with M divisible by the data-axis size;
    ``gallery``: (N, D) with N divisible by the model-axis size, padded
    per the row-0 duplicate contract above. Both pre-l2-normalized.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    data_axis = data_axis or mesh.axis_names[0]
    model_axis = model_axis or (
        mesh.axis_names[1] if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    )
    if model_axis == data_axis:
        # one-axis mesh: shard the gallery over it, replicate queries
        data_axis = None

    def body(q, g):
        local_n = g.shape[0]
        best, idx = gallery_match(q, g, normalize=False)
        gidx = idx + jax.lax.axis_index(model_axis) * local_n
        gbest = jax.lax.pmax(best, model_axis)
        cand = jnp.where(best >= gbest, gidx, jnp.int32(2**31 - 1))
        return gbest, jax.lax.pmin(cand, model_axis)

    q_spec = P(data_axis, None)
    o_spec = P(data_axis)
    matcher = shard_map(
        body,
        mesh=mesh,
        in_specs=(q_spec, P(model_axis, None)),
        out_specs=(o_spec, o_spec),
        check_vma=False,
    )
    return jax.jit(matcher)


@functools.partial(
    jax.jit, static_argnames=("k", "normalize", "chunk")
)
def gallery_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    normalize: bool = True,
    chunk: int = 131072,
    n_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k gallery matches per query: (scores (M, k), indices (M, k)),
    scores descending.

    Chunked MXU matmul with a running ``lax.top_k`` merge — peak memory
    is O(M·chunk), independent of N, so a 10⁷-row gallery never
    materializes an (M, N) matrix. The chunk loop is unrolled in Python
    (static trip count; ``lax.scan`` compiles pathologically slowly on
    the remote TPU toolchain — CLAUDE.md).

    ``n_valid`` (traced scalar): gallery rows with index ≥ n_valid score
    -inf. This must happen BEFORE the per-chunk top-k — the sharded
    wrapper's padding rows would otherwise evict genuine candidates from
    the local top-k and a post-hoc mask could not bring them back.
    """
    cd = _compute_dtype(gallery)
    if normalize:
        queries, gallery = _normalize(queries), _normalize(gallery)
    m, d = queries.shape
    n = gallery.shape[0]
    k = min(k, n)
    queries = queries.astype(cd)
    best_s = jnp.full((m, k), -jnp.inf, jnp.float32)
    best_i = jnp.zeros((m, k), jnp.int32)
    for start in range(0, n, chunk):
        g = gallery[start : start + chunk].astype(cd)
        s = jnp.dot(queries, g.T, preferred_element_type=jnp.float32)
        if n_valid is not None:
            col = start + jnp.arange(s.shape[1], dtype=jnp.int32)
            s = jnp.where(col[None, :] < n_valid, s, -jnp.inf)
        if s.shape[1] < k:  # short final chunk: pad so top_k is legal
            s = jnp.pad(s, ((0, 0), (0, k - s.shape[1])),
                        constant_values=-jnp.inf)
        ts, ti = jax.lax.top_k(s, k)
        ci = jnp.concatenate([best_i, (ti + start).astype(jnp.int32)], axis=1)
        cs = jnp.concatenate([best_s, ts], axis=1)
        best_s, sel = jax.lax.top_k(cs, k)
        best_i = jnp.take_along_axis(ci, sel, axis=1)
    return best_s, best_i


def make_sharded_gallery_topk(mesh, k, data_axis=None, model_axis=None):
    """Build a jitted (queries, gallery, n_actual) → (scores, indices)
    top-k matcher sharded over ``mesh`` (queries over data, gallery rows
    over model).

    Each shard computes a local top-k on its N/n_model rows, then the
    (M_local, k) candidates all-gather over the model axis (k·n_model
    values per query — tiny) and a final ``top_k`` picks the global
    winners. ``n_actual`` (traced, no recompile as the gallery grows)
    masks FaceGallery's row-0 duplicate padding out of the candidate
    set — the top-1 matcher's tie-break argument does not cover k > 1 —
    and the mask applies INSIDE the per-shard selection (a padding
    duplicate must not evict a genuine local candidate before the
    combine; post-hoc masking loses it irrecoverably when ≥ 2 padding
    rows land on one shard, i.e. whenever n_model ≥ 3). Queries and
    gallery pre-l2-normalized, same contract as
    :func:`make_sharded_gallery_match`.
    """
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    data_axis = data_axis or mesh.axis_names[0]
    model_axis = model_axis or (
        mesh.axis_names[1] if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    )
    if model_axis == data_axis:
        data_axis = None

    def body(q, g, n_actual):
        local_n = g.shape[0]
        kk = min(k, local_n)
        offset = jax.lax.axis_index(model_axis) * local_n
        # rows valid on THIS shard: global index < n_actual
        local_valid = jnp.clip(n_actual - offset, 0, local_n)
        s, i = gallery_topk(q, g, kk, normalize=False, n_valid=local_valid)
        gi = i + offset
        all_s = jax.lax.all_gather(s, model_axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(gi, model_axis, axis=1, tiled=True)
        bs, sel = jax.lax.top_k(all_s, min(k, all_s.shape[1]))
        return bs, jnp.take_along_axis(all_i, sel, axis=1)

    q_spec = P(data_axis, None)
    o_spec = P(data_axis, None)
    matcher = shard_map(
        body,
        mesh=mesh,
        in_specs=(q_spec, P(model_axis, None), P()),
        out_specs=(o_spec, o_spec),
        check_vma=False,
    )
    return jax.jit(matcher)


def make_sharded_gallery_scores(mesh, data_axis=None, model_axis=None):
    """Build a jitted (queries, gallery) → (M, N) score-matrix fn sharded
    over ``mesh`` (queries over data, gallery rows over model); each
    shard computes its (M/d, N/m) tile with the blocked Pallas matmul."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    data_axis = data_axis or mesh.axis_names[0]
    model_axis = model_axis or (
        mesh.axis_names[1] if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    )
    if model_axis == data_axis:
        data_axis = None

    def body(q, g):
        return gallery_scores(q, g, normalize=False)

    scorer = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None)),
        out_specs=P(data_axis, model_axis),
        check_vma=False,
    )
    return jax.jit(scorer)
