import time
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
for name, arr in [
    ("8MB f32 random", rng.standard_normal(8*1024*1024//4).astype(np.float32)),
    ("8MB f32 zeros", np.zeros(8*1024*1024//4, np.float32)),
    ("4MB int16 random", rng.integers(-30000, 30000, 4*1024*1024//2).astype(np.int16)),
    ("8MB scanlike", (rng.uniform(-150, 150, 8*1024*1024//4).astype(np.float32))),
]:
    d = jax.device_put(arr); jax.block_until_ready(d)
    t0 = time.perf_counter()
    for _ in range(3):
        d = jax.device_put(arr); jax.block_until_ready(d)
    dt = (time.perf_counter() - t0) / 3
    mb = arr.nbytes / 1e6
    print(f"H2D {name}: {dt*1000:.1f} ms -> {mb/dt:.0f} MB/s")

y = jax.device_put(rng.standard_normal(1024*1024//4).astype(np.float32))
jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(3):
    _ = np.asarray(y)
dt = (time.perf_counter() - t0) / 3
print(f"D2H 1 MB random: {dt*1000:.1f} ms -> {1/dt:.1f} MB/s")
