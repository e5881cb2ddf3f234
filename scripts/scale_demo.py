"""Scale demonstrations on one v5e chip:
1) gallery identification against 1M enrolled identities (blocked Pallas
   matmul+argmax — the (M,N) score matrix never exists)
2) ArcFace flash CE at 1M identity classes (XLA path would materialize
   a 0.5 GB logits tensor + its gradient; flash streams VMEM tiles)
"""
import sys, os; sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time, numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)

# --- 1M-identity gallery ---------------------------------------------------
from deep_insight_face_tpu.ops.distances import gallery_match
N, D, M = 1_000_000, 128, 256
g = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
q = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
s, idx = gallery_match(q, g); jax.block_until_ready(idx)
best = float("inf")
for r in range(3):
    t0 = time.perf_counter()
    s, idx = gallery_match(q + float(r + 1), g)
    _ = np.asarray(idx[:1])
    best = min(best, time.perf_counter() - t0)
print(f"gallery 1M ids: {M} queries in {best*1000:.1f} ms "
      f"({M/best:.0f} queries/s, {M*N/best/1e12:.2f} Tcomp/s)", flush=True)

# --- flash CE at 1M classes ------------------------------------------------
from deep_insight_face_tpu.ops.margin_softmax import flash_arcface_loss
B, C = 128, 1_000_000
emb = rng.normal(size=(B, D)).astype(np.float32)
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
w = rng.normal(size=(D, C)).astype(np.float32)
w /= np.linalg.norm(w, axis=0, keepdims=True)
labels = jnp.asarray(rng.integers(0, C, B).astype(np.int32))
wj = jnp.asarray(w); e0 = jnp.asarray(emb)
grad_fn = jax.jit(jax.value_and_grad(
    lambda e, ww: flash_arcface_loss(e, ww, labels), argnums=(0, 1)))
(l, gs) = grad_fn(e0, wj); jax.block_until_ready(gs[0])
best = float("inf")
for r in range(3):
    t0 = time.perf_counter()
    l, gs = grad_fn(e0 + float(r+1) * 1e-6, wj)
    _ = float(l)
    best = min(best, time.perf_counter() - t0)
print(f"flash CE 1M classes: fwd+bwd {best*1000:.1f} ms/step "
      f"(B={B}, loss={float(l):.3f})", flush=True)
