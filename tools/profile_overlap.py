"""Does an H2D transfer overlap device compute on the axon tunnel?"""
import time
import numpy as np
import jax, jax.numpy as jnp

x = jnp.asarray(np.random.rand(4096, 4096).astype(np.float32))
@jax.jit
def burn(x):
    def body(i, a):
        return a @ a * 1e-3 + a
    return jax.lax.fori_loop(0, 60, body, x)
r = burn(x); jax.block_until_ready(r)

payload = np.zeros((16, 57600, 3), np.int16)

# H2D alone
t0 = time.perf_counter(); d = jnp.asarray(payload); jax.block_until_ready(d)
t_h2d = time.perf_counter() - t0
# compute alone
t0 = time.perf_counter(); r = burn(x); jax.block_until_ready(r)
t_comp = time.perf_counter() - t0
# overlapped: dispatch compute, then H2D, wait both
t0 = time.perf_counter()
r = burn(x)
d2 = jnp.asarray(payload)
jax.block_until_ready((r, d2))
t_both = time.perf_counter() - t0
print(f"H2D alone: {t_h2d*1e3:.0f} ms, compute alone: {t_comp*1e3:.0f} ms, "
      f"overlapped: {t_both*1e3:.0f} ms (serial would be {1e3*(t_h2d+t_comp):.0f})")
# is jnp.asarray itself blocking?
t0 = time.perf_counter(); d3 = jnp.asarray(payload); t_enq = time.perf_counter() - t0
jax.block_until_ready(d3)
print(f"jnp.asarray enqueue time: {t_enq*1e3:.0f} ms (blocking if ~= H2D alone)")
