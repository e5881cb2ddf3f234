import os, sys
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platform_name", "cpu")
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=n, process_id=pid)
import jax.numpy as jnp
print(f"proc {pid}: local={jax.local_device_count()} global={jax.device_count()}", flush=True)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np
devs = np.array(jax.devices()).reshape(n * 4 // 2, 2)
mesh = Mesh(devs, ("data", "model"))
x = jnp.arange(jax.device_count(), dtype=jnp.float32)
y = jax.jit(lambda a: jnp.sum(a * a), out_shardings=NamedSharding(mesh, P()))(
    jax.device_put(x, NamedSharding(mesh, P(("data", "model")))))
print(f"proc {pid}: psum-ish result {float(y)}", flush=True)
