"""N-way one-shot evaluation.

The working version of the reference's Omniglot-style one-shot module
(reference: deep_insight_face/oneshot.py:9-141 — broken module-wide,
SURVEY §2 #15: undefined Xtrain/rng/model/…, invalid
``np.random.randint.choice``). Tasks: given one support image per N
identities and a query of one of them, rank support by embedding
similarity; accuracy = P(rank-1 correct). Batched entirely on device via
the fused gallery matcher.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from deep_insight_face_tpu.data.dataset import IdentityClass
from deep_insight_face_tpu.ops.distances import gallery_match


@dataclasses.dataclass(frozen=True)
class OneShotTask:
    """One N-way task: query path + N support paths (support[0] is the
    genuine identity's other image)."""

    query_path: str
    support_paths: Tuple[str, ...]
    target_index: int = 0


def make_oneshot_task(
    classes: Sequence[IdentityClass],
    n_way: int,
    rng: np.random.Generator,
) -> OneShotTask:
    """Sample an N-way 1-shot task (reference intent: oneshot.py:9-46)."""
    multi = [c for c in classes if len(c) >= 2]
    if not multi or len(classes) < n_way:
        raise ValueError(f"need ≥{n_way} identities and one with ≥2 images")
    target = multi[rng.integers(len(multi))]
    others = [c for c in classes if c.name != target.name]
    distractors = [others[i] for i in rng.choice(len(others), n_way - 1, replace=False)]
    qi, si = rng.choice(len(target.image_paths), 2, replace=False)
    support = [target.image_paths[si]] + [
        c.image_paths[rng.integers(len(c))] for c in distractors
    ]
    return OneShotTask(target.image_paths[qi], tuple(support), 0)


def evaluate_oneshot(
    embed_paths: Callable[[Sequence[str]], np.ndarray],
    classes: Sequence[IdentityClass],
    n_way: int,
    k_tasks: int,
    seed: int = 0,
) -> float:
    """Accuracy over ``k_tasks`` N-way tasks (reference intent:
    oneshot.py:110-141 ``test_oneshot``).

    ``embed_paths``: paths → (len, D) embeddings (the model under test).
    """
    rng = np.random.default_rng(seed)
    tasks = [make_oneshot_task(classes, n_way, rng) for _ in range(k_tasks)]
    # one embedding pass over all unique paths
    all_paths = sorted({p for t in tasks for p in (t.query_path, *t.support_paths)})
    embs = np.asarray(embed_paths(all_paths))
    index = {p: i for i, p in enumerate(all_paths)}

    correct = 0
    for t in tasks:
        q = embs[index[t.query_path]][None]
        support = embs[[index[p] for p in t.support_paths]]
        _, idx = gallery_match(q, support)
        correct += int(np.asarray(idx)[0] == t.target_index)
    return correct / k_tasks


def pixel_nearest_neighbour_oneshot(
    load_paths: Callable[[Sequence[str]], np.ndarray],
    classes: Sequence[IdentityClass],
    n_way: int,
    k_tasks: int,
    seed: int = 0,
) -> float:
    """Pixel-space nearest-neighbour accuracy over the SAME task stream
    as :func:`evaluate_oneshot` (same seed → identical tasks): rank
    support by L2 distance on raw pixels (the classic one-shot baseline
    the reference's plot intends; reference oneshot.py:110-141).

    ``load_paths``: paths → (len, H, W, C) images (any consistent size).
    """
    rng = np.random.default_rng(seed)
    tasks = [make_oneshot_task(classes, n_way, rng) for _ in range(k_tasks)]
    all_paths = sorted({p for t in tasks for p in (t.query_path, *t.support_paths)})
    pix = np.asarray(load_paths(all_paths), np.float32).reshape(len(all_paths), -1)
    index = {p: i for i, p in enumerate(all_paths)}

    correct = 0
    for t in tasks:
        q = pix[index[t.query_path]]
        support = pix[[index[p] for p in t.support_paths]]
        d = np.linalg.norm(support - q[None], axis=1)
        correct += int(int(np.argmin(d)) == t.target_index)
    return correct / k_tasks


def _default_pixel_loader(image_size: int = 64):
    from deep_insight_face_tpu.data.dataset import load_image

    def load_paths(paths: Sequence[str]) -> np.ndarray:
        return np.stack([load_image(p, image_size) for p in paths])

    return load_paths


def nearest_neighbour_baseline(
    embed_paths: Callable[[Sequence[str]], np.ndarray],
    classes: Sequence[IdentityClass],
    n_way: int,
    k_tasks: int,
    seed: int = 0,
    load_paths: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
) -> Dict[str, float]:
    """Model accuracy vs the pixel-space nearest-neighbour AND
    random-guess baselines at one N (reference intent: oneshot.py
    model/NN/random curves). ``load_paths`` defaults to 64² decoded
    pixels."""
    acc = evaluate_oneshot(embed_paths, classes, n_way, k_tasks, seed)
    nn = pixel_nearest_neighbour_oneshot(
        load_paths or _default_pixel_loader(), classes, n_way, k_tasks, seed
    )
    return {"model": acc, "pixel_nn": nn, "random": 1.0 / n_way}


def oneshot_sweep(
    embed_paths: Callable[[Sequence[str]], np.ndarray],
    classes: Sequence[IdentityClass],
    ways: Sequence[int] = (2, 5, 10, 20),
    k_tasks: int = 50,
    seed: int = 0,
    load_paths: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
) -> Dict[int, Dict[str, float]]:
    """Accuracy-vs-N sweep: {n_way: {model, pixel_nn, random}} for each N
    that the identity pool supports (reference intent: oneshot.py:110-141
    ``one_shot_clf`` accuracy-vs-ways plot). Plot with
    :func:`deep_insight_face_tpu.visualizations.plot.oneshot_sweep_plot`.
    """
    out: Dict[int, Dict[str, float]] = {}
    for n in ways:
        if n > len(classes):
            continue
        out[n] = nearest_neighbour_baseline(
            embed_paths, classes, n, k_tasks, seed=seed, load_paths=load_paths
        )
    return out


def make_trainer_validator(
    trainer,
    classes: Sequence[IdentityClass],
    n_way: int = 5,
    k_tasks: int = 40,
    seed: int = 0,
    save_path: Optional[str] = None,
    embed_chunk: int = 64,
):
    """Periodic one-shot validation hook for ``Trainer.fit(on_epoch_end=…)``
    with best-weight save — the working version of the reference's
    train-with-test_oneshot loop (reference: oneshot.py:88-107
    ``init_training``: periodic test_oneshot + best-weight save).

    Evaluates N-way one-shot accuracy on held-out ``classes`` after each
    epoch, logs ``oneshot_acc`` through the trainer's MetricsLogger, and
    (when ``save_path`` is set) writes the best-so-far inference
    variables as an npz. The returned hook exposes ``hook.best`` →
    {"acc", "epoch"}.
    """
    import jax
    import jax.numpy as jnp

    from deep_insight_face_tpu.data.dataset import load_image
    from deep_insight_face_tpu.ops.image import preprocess

    size = trainer.cfg.model.image_size
    mode = trainer.cfg.data.preprocess_mode
    model = trainer.model

    @jax.jit
    def _embed(variables, x):
        return model.apply(variables, preprocess(x, mode), train=False)

    def _embed_paths_fn(variables):
        from deep_insight_face_tpu.utils.batching import batched_apply

        def embed_paths(paths: Sequence[str]) -> np.ndarray:
            imgs = np.stack(
                [load_image(p, size) for p in paths]
            ).astype(np.float32)
            # fixed-geometry batches (one jit compile); helper pads+trims
            return batched_apply(
                lambda c: _embed(variables, jnp.asarray(c)), imgs,
                embed_chunk,
            )

        return embed_paths

    best = {"acc": -1.0, "epoch": -1}

    def hook(epoch: int, state) -> float:
        params = {k: v for k, v in state.params.items() if k != "classifier"}
        variables = {"params": params, "batch_stats": state.batch_stats}
        # FIXED task sample across epochs: best-weight selection compares
        # accuracies, so every epoch must be scored on the SAME tasks —
        # resampling per epoch adds ±1/sqrt(k_tasks) binomial noise and
        # the argmax latches whichever epoch drew easy tasks
        acc = evaluate_oneshot(
            _embed_paths_fn(variables), classes, n_way, k_tasks,
            seed=seed,
        )
        trainer.logger.log(
            int(state.step), {"oneshot_acc": acc, "oneshot_epoch": epoch}
        )
        if acc > best["acc"]:
            best["acc"], best["epoch"] = acc, epoch
            if save_path is not None:
                from deep_insight_face_tpu.utils.weights import save_npz

                save_npz(save_path, variables)
        return acc

    hook.best = best
    return hook
