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


def nearest_neighbour_baseline(
    embed_paths: Callable[[Sequence[str]], np.ndarray],
    classes: Sequence[IdentityClass],
    n_way: int,
    k_tasks: int,
    seed: int = 0,
) -> Dict[str, float]:
    """Model accuracy vs random-guess baseline per N (reference intent:
    oneshot.py plotting of model/NN/random curves)."""
    acc = evaluate_oneshot(embed_paths, classes, n_way, k_tasks, seed)
    return {"model": acc, "random": 1.0 / n_way}
