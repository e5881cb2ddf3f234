"""1M-identity gallery identification benchmark through the SHARDED path.

Measures FaceGallery.identify q/s with the gallery enrolled behind a
``jax.sharding.Mesh`` (gallery rows over the model axis) — the code path
that scales capacity with devices (VERDICT r2 #3; SURVEY §5 long-axis;
reference equivalent: a per-identity numpy loop, predictions.py:74-79).
On the single bench chip the mesh is 1-wide, so this prices the
shard_map + combine overhead against the fused single-device kernel.

Honest timing per CLAUDE.md: chained identify calls with distinct query
batches, results fetched to host, several rounds with best taken.

Usage: python scripts/gallery_bench.py [--n-ids 1000000 --queries 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ids", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--topk", type=int, default=5,
                    help="also benchmark identify_topk at this k (0 skips)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="device gallery storage dtype (bfloat16 halves "
                         "HBM and the match kernel's feed bytes)")
    args = ap.parse_args()

    import jax
    from jax.sharding import Mesh

    from deep_insight_face_tpu.gallery import FaceGallery

    rng = np.random.default_rng(0)
    t0 = time.time()
    embs = rng.standard_normal((args.n_ids, args.dim), dtype=np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    names = [f"id{i}" for i in range(args.n_ids)]
    print(f"generated {args.n_ids} ids in {time.time()-t0:.0f}s", flush=True)

    import jax.numpy as jnp

    mesh = Mesh(np.array(jax.devices()), ("model",))
    gal = FaceGallery(embedding_size=args.dim, mesh=mesh,
                      dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
    gal.add_batch(names, embs)

    queries = [
        np.ascontiguousarray(embs[rng.integers(0, args.n_ids, args.queries)])
        + rng.standard_normal((args.queries, args.dim), dtype=np.float32) * 0.1
        for _ in range(3)
    ]

    # warmup (device placement + compile)
    n, s = gal.identify(queries[0])
    print(f"warmup ok (first match {n[0]} score {s[0]:.3f})", flush=True)

    best = float("inf")
    for r in range(args.rounds):
        t0 = time.perf_counter()
        for q in queries:
            # r+1: round 0 must not re-dispatch the warmup's exact
            # (executable, args) — the tunnel value-caches identical
            # calls (CLAUDE.md) and min() would pick the cached round
            names_out, scores = gal.identify(q + np.float32((r + 1) * 1e-4))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    qps = args.queries * len(queries) / best

    out = {
        "metric": "gallery_identify_sharded",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "n_identities": args.n_ids,
        "dim": args.dim,
        "query_batch": args.queries,
        "mesh_devices": int(np.prod(list(mesh.shape.values()))),
        "gallery_dtype": args.dtype,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out), flush=True)

    if args.topk:
        nk, sk = gal.identify_topk(queries[0], k=args.topk)  # warmup
        print(f"topk warmup ok (first row {nk[0][:2]} …)", flush=True)
        best = float("inf")
        for r in range(args.rounds):
            t0 = time.perf_counter()
            for q in queries:
                gal.identify_topk(q + np.float32((r + 1) * 1e-4),
                                  k=args.topk)
            best = min(best, time.perf_counter() - t0)
        out_k = dict(out)
        out_k.update(
            metric="gallery_identify_topk_sharded",
            value=round(args.queries * len(queries) / best, 1),
            k=args.topk,
        )
        print(json.dumps(out_k), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
