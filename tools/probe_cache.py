import time
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
q = jnp.asarray(rng.uniform(-50, 50, (2048, 3)).astype(np.float32))
t = jnp.asarray(rng.uniform(-50, 50, (65536, 3)).astype(np.float32))
v = jnp.ones((65536,), bool)
from plo_tpu.ops import neighbors

f = jax.jit(lambda q, t, v: neighbors.knn(q, t, v, k=20, radius=1.0, select="approx")[0].sum())
out = f(q, t, v); jax.block_until_ready(out)
for rep in range(4):
    t0 = time.perf_counter()
    jax.block_until_ready(f(q, t, v))
    print(f"identical-args rep {rep}: {(time.perf_counter()-t0)*1000:.2f} ms")
qs = [jnp.asarray(rng.uniform(-50, 50, (2048, 3)).astype(np.float32)) for _ in range(4)]
jax.block_until_ready(qs)
for rep in range(4):
    t0 = time.perf_counter()
    jax.block_until_ready(f(qs[rep], t, v))
    print(f"fresh-args rep {rep}:     {(time.perf_counter()-t0)*1000:.2f} ms")
