import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
print("jax ready", flush=True)
x = jnp.arange(1024.0)
f = jax.jit(lambda a: jnp.sum(a * a))
float(f(x))
print("compiled", flush=True)
out = "/root/repo/.verify_tmp/trace_probe"
t0 = time.time()
jax.profiler.start_trace(out)
print(f"start_trace ok {time.time()-t0:.1f}s", flush=True)
float(f(x + 1))
t0 = time.time()
jax.profiler.stop_trace()
print(f"stop_trace ok {time.time()-t0:.1f}s", flush=True)
import subprocess
print(subprocess.run(["find", out, "-type", "f"], capture_output=True, text=True).stdout, flush=True)
