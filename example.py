"""End-to-end demo of the framework on the procedural face world.

The working version of the reference's Jupyter-style ``example.py``
(reference: /root/reference/example.py — pulls generator batches and
imshows them, with a TODO list admitting the pipeline is unverified).

This walks the full user journey on real visual structure (parametric
faces from data/synthetic.py, not noise):

  dataset on disk → samplers → device prefetch → ArcFace training →
  LFW-protocol verification on the trained model → gallery
  enrollment/identification → one-shot eval → saved plot artifacts
  (PCA of embeddings, training history, sample grid) under
  ``./example_out/``.

Run:  python example.py            (~2-4 min on CPU, faster on TPU)
Exits non-zero if the trained model fails to verify (accuracy ≤ 0.8) —
i.e. this is a correctness demo, not just plumbing.
"""

import os
import tempfile

import numpy as np

N_IDS = 10
PER_ID = 10
SIZE = 48
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "example_out")


def main() -> int:
    import jax

    from deep_insight_face_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from deep_insight_face_tpu.data.dataset import ImageLoader, get_dataset
    from deep_insight_face_tpu.data.pairs import generate_pairs
    from deep_insight_face_tpu.data.synthetic import identity_directory
    from deep_insight_face_tpu.evaluation.evals import evaluate_lfw
    from deep_insight_face_tpu.gallery import FaceGallery
    from deep_insight_face_tpu.oneshot import evaluate_oneshot
    from deep_insight_face_tpu.ops.image import preprocess
    from deep_insight_face_tpu.training.trainer import Trainer
    from deep_insight_face_tpu.visualizations import plot

    tmp = tempfile.mkdtemp()
    data_dir = os.path.join(tmp, "faces")
    print(f"rendering {N_IDS} procedural identities × {PER_ID} images…")
    identity_directory(data_dir, N_IDS, PER_ID, size=SIZE, seed=0)
    os.makedirs(OUT_DIR, exist_ok=True)

    cfg = Config(
        model=ModelConfig(backbone="mobilenetv2", head="gdc",
                          embedding_size=64, image_size=SIZE,
                          compute_dtype="float32", width_multiplier=0.35),
        data=DataConfig(batch_size=32, augmentation="none",
                        num_decode_threads=2),
        train=TrainConfig(mode="arcface", num_classes=N_IDS, epochs=16,
                          steps_per_epoch=25, learning_rate=5e-3,
                          warmup_steps=20, weight_decay=1e-4,
                          checkpoint_dir=os.path.join(tmp, "ckpt"),
                          checkpoint_every=0, log_every=25),
    )

    # --- train --------------------------------------------------------------
    trainer = Trainer(cfg, log_dir=os.path.join(tmp, "logs"))
    # snapshot the untrained embeddings for the before/after PCA plot
    from deep_insight_face_tpu.models import init_embedding_params

    init_vars = init_embedding_params(
        trainer.model, jax.random.key(0), SIZE
    )
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

    # --- LFW-protocol verification on the trained model ---------------------
    generate_pairs(data_dir, num_folds=2, num_matches_mismatches=10,
                   write_to_file=True, seed=1, rename_to_lfw=False)
    report = evaluate_lfw(
        embed_images, data_dir, os.path.join(data_dir, "pairs.txt"),
        image_size=SIZE,
    )
    acc = float(np.mean(report.accuracy))
    print("verification:", report.summary())

    # --- gallery: enroll one image per person, identify unseen probes -------
    classes = get_dataset(data_dir)
    loader = ImageLoader(image_size=SIZE)
    gallery = FaceGallery(embedding_size=cfg.model.embedding_size)
    for c in classes:
        emb = embed_images(loader.load_batch([c.image_paths[0]]))
        gallery.add(c.name, emb[0])
    hits = 0
    for c in classes:
        probe = embed_images(loader.load_batch([c.image_paths[1]]))
        names, scores = gallery.identify(probe)
        hits += names[0] == c.name
    print(f"gallery identification: {hits}/{len(classes)} probes correct")
    topk_names, topk_scores = gallery.identify_topk(probe, k=3)
    print(f"  last probe top-3: {topk_names[0]} "
          f"(scores {np.round(topk_scores[0], 2).tolist()})")

    # --- one-shot -----------------------------------------------------------
    def embed_paths(paths):
        return embed_images(loader.load_batch(list(paths)))

    oneshot = evaluate_oneshot(embed_paths, classes, n_way=5, k_tasks=40)
    print(f"5-way one-shot accuracy: {oneshot:.2f} (random = 0.20)")

    # accuracy-vs-N sweep with pixel-NN + random baselines
    # (the working version of the reference's one_shot_clf plot)
    from deep_insight_face_tpu.oneshot import oneshot_sweep

    sweep = oneshot_sweep(
        embed_paths, classes, ways=(2, 5, 10), k_tasks=30,
        load_paths=lambda paths: loader.load_batch(list(paths)),
    )
    for n, row in sorted(sweep.items()):
        print(f"  {n:>2}-way: model {row['model']:.2f}  "
              f"pixel-NN {row['pixel_nn']:.2f}  random {row['random']:.2f}")
    plot.oneshot_sweep_plot(
        sweep, out_path=os.path.join(OUT_DIR, "oneshot_sweep.png")
    )

    # --- plot artifacts ------------------------------------------------------
    all_paths, all_labels = [], []
    for i, c in enumerate(classes):
        all_paths += list(c.image_paths)
        all_labels += [i] * len(c.image_paths)
    embs = embed_paths(all_paths)
    raw = loader.load_batch(all_paths)
    embs_before = np.asarray(jit_embed(init_vars, preprocess(raw, "tf")))
    plot.pca_visualization(
        embs_before, embs, np.array(all_labels),
        out_path=os.path.join(OUT_DIR, "embeddings_pca.png"),
    )
    plot.hist_plot_from_jsonl(
        os.path.join(tmp, "logs", "arcface.jsonl"), ["loss"],
        out_path=os.path.join(OUT_DIR, "training_history.png"),
    )
    sample = loader.load_batch([c.image_paths[0] for c in classes])
    plot.grid_visualization(
        sample.astype(np.uint8), cols=5,
        out_path=os.path.join(OUT_DIR, "identities_grid.png"),
    )
    print(f"plots saved under {OUT_DIR}/")

    ok = acc > 0.8 and hits >= len(classes) - 1
    print(f"verification accuracy {acc:.3f} → "
          + ("PASS (" if ok else "FAIL (need >0.8 and gallery hits; ")
          + f"gallery {hits}/{len(classes)})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
