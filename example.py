"""End-to-end smoke walkthrough of the framework.

The working version of the reference's Jupyter-style ``example.py``
(reference: /root/reference/example.py — pulls generator batches and
imshows them, with a TODO list admitting the pipeline is unverified).
Builds a tiny synthetic identity dataset, then exercises: dataset scan →
samplers → device prefetch → a few ArcFace train steps → LFW-protocol
eval → gallery enrollment/identification → one-shot tasks.

Run:  python example.py
"""

import os
import tempfile

import numpy as np
from PIL import Image


def make_synthetic_dataset(root: str, n_ids: int = 8, imgs_per_id: int = 4,
                           size: int = 32) -> None:
    rng = np.random.default_rng(0)
    for i in range(n_ids):
        d = os.path.join(root, f"Person_{i}")
        os.makedirs(d, exist_ok=True)
        base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        for j in range(1, imgs_per_id + 1):
            noisy = np.clip(
                base.astype(int) + rng.integers(-25, 25, base.shape), 0, 255
            ).astype(np.uint8)
            Image.fromarray(noisy).save(os.path.join(d, f"Person_{i}_{j:04d}.jpg"))


def main() -> None:
    import jax

    from deep_insight_face_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from deep_insight_face_tpu.data.dataset import get_dataset
    from deep_insight_face_tpu.data.pairs import generate_pairs
    from deep_insight_face_tpu.evaluation.evals import evaluate_lfw
    from deep_insight_face_tpu.gallery import FaceGallery
    from deep_insight_face_tpu.ops.image import preprocess
    from deep_insight_face_tpu.oneshot import evaluate_oneshot
    from deep_insight_face_tpu.training.trainer import Trainer

    tmp = tempfile.mkdtemp()
    data_dir = os.path.join(tmp, "faces")
    make_synthetic_dataset(data_dir)
    print(f"dataset: {data_dir}")

    cfg = Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc", embedding_size=32,
                          image_size=32, compute_dtype="float32",
                          width_multiplier=0.35),
        data=DataConfig(batch_size=16, augmentation="non_geometric",
                        num_decode_threads=2),
        train=TrainConfig(mode="arcface", num_classes=8, epochs=2,
                          steps_per_epoch=4, learning_rate=1e-3,
                          warmup_steps=0, weight_decay=0.0,
                          checkpoint_dir=os.path.join(tmp, "ckpt"),
                          checkpoint_every=0, log_every=1),
    )

    # --- train a few steps --------------------------------------------------
    trainer = Trainer(cfg, log_dir=os.path.join(tmp, "logs"))
    result = trainer.fit_directory(data_dir)
    print(f"trained {result.steps} steps, final loss "
          f"{result.history[-1].get('epoch_loss'):.4f}")

    # --- embed helper -------------------------------------------------------
    model = trainer.model
    state = result.state
    jit_embed = jax.jit(lambda v, x: model.apply(v, x, train=False))
    variables = {
        "params": {k: v for k, v in state.params.items() if k != "classifier"},
        "batch_stats": state.batch_stats,
    }

    def embed_images(imgs):
        return np.asarray(jit_embed(variables, preprocess(imgs, "tf")))

    # --- LFW-protocol eval --------------------------------------------------
    generate_pairs(data_dir, num_folds=2, num_matches_mismatches=6,
                   write_to_file=True, seed=1, rename_to_lfw=False)
    report = evaluate_lfw(
        embed_images, data_dir, os.path.join(data_dir, "pairs.txt"),
        image_size=32,
    )
    print("verification:", report.summary())

    # --- gallery ------------------------------------------------------------
    classes = get_dataset(data_dir)
    from deep_insight_face_tpu.data.dataset import ImageLoader

    loader = ImageLoader(image_size=32)
    gallery = FaceGallery(embedding_size=32)
    for c in classes:
        emb = embed_images(loader.load_batch([c.image_paths[0]]))
        gallery.add(c.name, emb[0])
    probe = embed_images(loader.load_batch([classes[3].image_paths[1]]))
    names, scores = gallery.identify(probe)
    print(f"identify probe of {classes[3].name}: → {names[0]} "
          f"(score {scores[0]:.3f})")

    # --- one-shot -----------------------------------------------------------
    def embed_paths(paths):
        return embed_images(loader.load_batch(list(paths)))

    acc = evaluate_oneshot(embed_paths, classes, n_way=4, k_tasks=20)
    print(f"4-way one-shot accuracy: {acc:.2f} (random = 0.25)")


if __name__ == "__main__":
    main()
