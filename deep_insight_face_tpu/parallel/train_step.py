"""Sharded training steps for every training mode the reference supports
(and the ArcFace mode its BASELINE asks for).

Modes → batches:

- ``siamese``      {images_a, images_b, labels}  contrastive pairs
                   (reference: training/siamese.py + networks/siamese.py:32-39)
- ``triplet``      {anchor, positive, negative}  naive margin triplet
                   (reference: training/triplet.py + networks/triplet.py:16-46)
- ``batch_hard`` / ``batch_hard_euclidean`` / ``batch_hard_auto`` /
  ``batch_all`` / ``semi_hard``
                   {images, labels}  online-mining losses
                   (reference: common/losses.py:33-148,249-308)
- ``arcface``      {images, labels}  combined-margin softmax over a
                   model-parallel classifier (BASELINE north star)

Parallelism is GSPMD-style: the step is written as a *global* program;
the batch is sharded over the ``data`` mesh axis, the ArcFace classifier
over ``model`` (vocab-parallel), everything else replicated. XLA inserts
the all-gathers for the global (B×B) mining matrices and the psums for
the sharded-softmax reductions — the mining losses therefore mine over
the GLOBAL batch, which the reference could never do (it is single-GPU,
SURVEY §2 #26).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_insight_face_tpu.config import Config
from deep_insight_face_tpu.models.embedding import EmbeddingModel
from deep_insight_face_tpu.ops import losses as L
from deep_insight_face_tpu.ops import mining as M

MINING_MODES = ("batch_hard", "batch_hard_euclidean", "batch_hard_auto",
                "batch_all", "semi_hard")
PAIR_MODES = ("siamese",)
TRIPLET_MODES = ("triplet",)
CLASSIFIER_MODES = ("arcface", "cosface")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    alpha: jnp.ndarray  # auto-alpha margin state (reference: losses.py:93)
    rng: jax.Array

    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW with linear warmup (reference uses plain Adam:
    networks/triplet.py:178 lr 1e-4, networks/siamese.py:157 lr 6e-5)."""
    t = cfg.train
    if t.lr_schedule == "cosine":
        if t.decay_steps <= 0:
            raise ValueError("lr_schedule='cosine' needs decay_steps > 0")
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=t.learning_rate,
            warmup_steps=max(t.warmup_steps, 1),
            decay_steps=t.decay_steps,
            end_value=t.learning_rate * t.lr_floor_frac,
        )
    elif t.warmup_steps > 0:
        sched = optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps)
    else:
        sched = t.learning_rate
    chain = []
    if t.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(t.grad_clip_norm))
    if t.weight_decay > 0:
        chain.append(optax.adamw(sched, weight_decay=t.weight_decay))
    else:
        chain.append(optax.adam(sched))
    return optax.chain(*chain)


def create_train_state(
    model: EmbeddingModel,
    cfg: Config,
    rng: jax.Array,
    mesh=None,
) -> TrainState:
    """Init params (+ model-parallel classifier for arcface modes) and
    place them on the mesh."""
    t = cfg.train
    k_model, k_cls, k_state = jax.random.split(rng, 3)
    dummy = jnp.zeros(
        (1, cfg.model.image_size, cfg.model.image_size, cfg.model.channels),
        jnp.float32,
    )
    variables = model.init({"params": k_model}, dummy, train=False)
    params = dict(variables["params"])
    batch_stats = variables.get("batch_stats", {})

    tx = make_optimizer(cfg)

    def _heavy_init(k):
        """Classifier kernel + optimizer state in one traceable fn so the
        (D, num_classes) kernel and its Adam moments can materialize
        ALREADY SHARDED over the model axis — initializing them on the
        default device first and resharding after would peak at the full
        unsharded footprint (e.g. ~15 GB for 10^7 ids in fp32 kernel +
        moments), OOMing a single chip for exactly the scale the
        vocab-parallel classifier exists for."""
        p = dict(params)
        if t.mode in CLASSIFIER_MODES:
            p["classifier"] = {
                "kernel": jax.nn.initializers.glorot_normal()(
                    k, (cfg.model.embedding_size, t.num_classes), jnp.float32
                )
            }
        return p, tx.init(p)

    if mesh is not None:
        rule = _shard_rule(mesh)
        shapes = jax.eval_shape(_heavy_init, k_cls)
        out_shardings = jax.tree_util.tree_map_with_path(rule, shapes)
        params, opt_state = jax.jit(
            _heavy_init, out_shardings=out_shardings
        )(k_cls)
    else:
        params, opt_state = _heavy_init(k_cls)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        alpha=jnp.ones((), jnp.float32),
        rng=k_state,
        tx=tx,
        apply_fn=model.apply,
    )
    if mesh is not None:
        state = place_state(state, cfg, mesh)
    return state


def _shard_rule(mesh):
    """(path, leaf) -> NamedSharding: anything under a 'classifier' key
    (kernel AND its optimizer moments) shards over the model axis,
    everything else replicates."""
    model_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    rep = NamedSharding(mesh, P())
    cls = NamedSharding(mesh, P(None, model_axis))

    def shard_of(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        if "classifier" in keys:
            return cls
        return rep

    return shard_of


def state_shardings(state: TrainState, cfg: Config, mesh) -> TrainState:
    """Sharding tree: classifier kernel over 'model', everything else
    replicated."""
    return jax.tree_util.tree_map_with_path(_shard_rule(mesh), state)


def place_state(state: TrainState, cfg: Config, mesh) -> TrainState:
    shardings = state_shardings(state, cfg, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


# ---------------------------------------------------------------------------
# loss dispatch
# ---------------------------------------------------------------------------


def _embed(apply_fn, params, batch_stats, images, rng, train: bool,
           bn_frozen: bool = False):
    variables = {"params": params, "batch_stats": batch_stats}
    if train and bn_frozen:
        # BN-denial phase: the loss forward sees only RUNNING statistics,
        # so gradients cannot exploit per-batch statistic fluctuations —
        # the "BN shortcut" (train-acc 1.0, constant eval function) that
        # MobileNetV2 ArcFace converges to on small synthetic worlds is
        # impossible by construction. Running stats keep tracking via a
        # stop-gradient side pass in train_step. NOTE (intentional): the
        # frozen phase is also dropout-free — train=False makes the loss
        # forward fully deterministic per sample, which is the denial
        # phase's contract (the serve-time function IS the train-time
        # function); it begins only after bn_freeze_step warm steps of
        # normal dropout-regularized training.
        return apply_fn(variables, images, train=False), batch_stats
    if train:
        out, mut = apply_fn(
            variables, images, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]
    return apply_fn(variables, images, train=False), batch_stats


def _batch_images(batch) -> jnp.ndarray:
    """All image tensors of a batch, concatenated (for BN side updates)."""
    if "images" in batch:
        return batch["images"]
    if "images_a" in batch:
        return jnp.concatenate([batch["images_a"], batch["images_b"]], 0)
    return jnp.concatenate(
        [batch["anchor"], batch["positive"], batch["negative"]], 0
    )


def _classifier_loss(cfg: Config, emb, kernel, labels):
    t = cfg.train
    if t.mode == "cosface":
        m1, m2, m3 = 1.0, 0.0, 0.35
    else:
        m1, m2, m3 = 1.0, t.arcface_margin, 0.0
    if t.flash_ce:
        # Pallas flash CE: normalize here, stream the (B, C) middle in VMEM
        from deep_insight_face_tpu.ops.margin_softmax import flash_arcface_loss

        emb_n = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )
        w_n = kernel / jnp.maximum(
            jnp.linalg.norm(kernel, axis=0, keepdims=True), 1e-12
        )
        loss = flash_arcface_loss(emb_n, w_n, labels, m1, m2, m3, t.arcface_scale)
        return loss, {}
    logits = L.arcface_logits(
        emb, kernel, labels, margin1=m1, margin2=m2, margin3=m3,
        scale=t.arcface_scale,
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return jnp.mean(nll), {"accuracy": acc}


def make_train_step(cfg: Config, mesh=None, bn_frozen: bool = False):
    """Build the jitted (state, batch) → (state, metrics) step for cfg.train.mode.

    ``bn_frozen=True`` builds the BN-denial variant: the loss forward
    runs BatchNorm in running-average mode (batch statistics are
    unavailable to the gradient), while running stats continue tracking
    through a stop-gradient side pass. Use after a warm phase
    (TrainConfig.bn_freeze_step) to train BN-shortcut-prone
    architectures (MobileNetV2) to honest per-sample features.
    """
    t = cfg.train
    mode = t.mode
    data_axis = mesh.axis_names[0] if mesh is not None else None
    sharded_flash = None
    if t.flash_ce and mode in CLASSIFIER_MODES and mesh is not None:
        # cross-shard flash CE: each model shard runs the Pallas kernel
        # over its identity range; partials combine with pmax/psum
        # (ops/margin_softmax.make_sharded_flash_arcface_loss)
        from deep_insight_face_tpu.ops.margin_softmax import (
            make_sharded_flash_arcface_loss,
        )

        if mode == "cosface":
            fm1, fm2, fm3 = 1.0, 0.0, 0.35
        else:
            fm1, fm2, fm3 = 1.0, t.arcface_margin, 0.0
        sharded_flash = make_sharded_flash_arcface_loss(
            mesh, mesh.axis_names[0], mesh.axis_names[1],
            margin1=fm1, margin2=fm2, margin3=fm3, scale=t.arcface_scale,
        )

    def constrain_data(x):
        if mesh is None:
            return x
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def loss_fn(params, state: TrainState, batch, rng):
        new_alpha = state.alpha
        metrics: Dict[str, jnp.ndarray] = {}

        if mode in PAIR_MODES:
            n = batch["images_a"].shape[0]
            both = jnp.concatenate([batch["images_a"], batch["images_b"]], 0)
            emb, new_stats = _embed(
                state.apply_fn, params, state.batch_stats, constrain_data(both),
                rng, True, bn_frozen,
            )
            ea, eb = emb[:n], emb[n:]
            from deep_insight_face_tpu.ops.distances import euclidean_distance

            dist = euclidean_distance(ea, eb)
            loss = L.contrastive_loss(batch["labels"], dist, t.contrastive_margin)
            metrics["pair_accuracy"] = L.contrastive_accuracy(
                batch["labels"].astype(jnp.float32), dist
            )
        elif mode in TRIPLET_MODES:
            n = batch["anchor"].shape[0]
            all_imgs = jnp.concatenate(
                [batch["anchor"], batch["positive"], batch["negative"]], 0
            )
            emb, new_stats = _embed(
                state.apply_fn, params, state.batch_stats,
                constrain_data(all_imgs), rng, True, bn_frozen,
            )
            loss = L.naive_triplet_loss(
                emb[:n], emb[n : 2 * n], emb[2 * n :], alpha=t.margin
            )
        else:
            emb, new_stats = _embed(
                state.apply_fn, params, state.batch_stats,
                constrain_data(batch["images"]), rng, True, bn_frozen,
            )
            labels = batch["labels"]
            if mode in CLASSIFIER_MODES:
                if sharded_flash is not None:
                    kernel = params["classifier"]["kernel"]
                    emb_n = emb / jnp.maximum(
                        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
                    )
                    w_n = kernel / jnp.maximum(
                        jnp.linalg.norm(kernel, axis=0, keepdims=True), 1e-12
                    )
                    loss = sharded_flash(emb_n, w_n, labels)
                else:
                    loss, extra = _classifier_loss(
                        cfg, emb, params["classifier"]["kernel"], labels
                    )
                    metrics.update(extra)
                if "distill_targets" in batch and t.distill_weight > 0:
                    # teacher-embedding distillation: cosine-pull the
                    # student toward precomputed (normalized) teacher
                    # embeddings of the same crops (TrainConfig
                    # .distill_weight)
                    emb_n = emb / jnp.maximum(
                        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
                    )
                    tgt = constrain_data(batch["distill_targets"])
                    dcos = jnp.sum(emb_n * tgt, axis=-1)
                    loss = loss + t.distill_weight * jnp.mean(1.0 - dcos)
                    metrics["distill_cos"] = jnp.mean(dcos)
            elif mode == "batch_hard":
                loss = M.batch_hard_cosine_loss(labels, emb, t.margin)
            elif mode == "batch_hard_euclidean":
                loss = M.batch_hard_euclidean_loss(labels, emb, t.margin)
            elif mode == "batch_hard_auto":
                loss, new_alpha = M.batch_hard_euclidean_auto_alpha_loss(
                    labels, emb, state.alpha,
                    alpha_factor=t.auto_alpha_factor,
                )
            elif mode == "batch_all":
                loss = M.batch_all_cosine_loss(labels, emb, t.margin)
            elif mode == "semi_hard":
                loss = L.semi_hard_triplet_loss(
                    labels, emb, margin=t.semi_hard_margin
                )
            else:
                raise ValueError(f"unknown training mode {mode!r}")

        metrics["loss"] = loss
        return loss, (new_stats, new_alpha, metrics)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, new_alpha, metrics)), grads = grad_fn(
            state.params, state, batch, step_rng
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if bn_frozen:
            # stop-gradient side pass: keep running stats tracking the
            # (drifting) activations without exposing batch stats to the
            # loss
            _, mut = state.apply_fn(
                {"params": jax.lax.stop_gradient(new_params),
                 "batch_stats": state.batch_stats},
                constrain_data(_batch_images(batch)),
                train=True, mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            new_stats = mut["batch_stats"]
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            alpha=new_alpha,
            rng=rng,
        )
        return new_state, metrics

    donate = functools.partial(jax.jit, donate_argnums=(0,))
    return donate(train_step)


def make_eval_embed_fn(model: EmbeddingModel, mesh=None):
    """Jitted inference embedding (images sharded over data when meshed)."""

    @jax.jit
    def embed(params, batch_stats, images):
        if mesh is not None:
            spec = P(mesh.axis_names[0], None, None, None)
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, spec)
            )
        return model.apply(
            {"params": {k: v for k, v in params.items() if k != "classifier"},
             "batch_stats": batch_stats},
            images, train=False,
        )

    return embed
