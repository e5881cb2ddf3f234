import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp, numpy as np, time
t0=time.time()
x = jnp.ones((256,256))
y = (x@x)
print("devices:", jax.devices(), "sum:", float(y.sum()), "t=%.1fs"%(time.time()-t0))
