"""What dominates the IMLS freeze search (2000x57600 k=20) and can the MXU
or bf16 beat the coordinate-difference VPU form?"""
import time
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu.ops import neighbors

rng = np.random.default_rng(0)
Q, T, K = 2048, 57600, 20
q0 = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))
t = jnp.asarray(rng.uniform(-50, 50, (T, 3)).astype(np.float32))
v = jnp.ones((T,), bool)

def timeit(name, body, init, fetch):
    print(f"{name}: {devtime(body, init, fetch=fetch):.2f} ms", flush=True)

# current engine
def b_engine(args):
    q, acc = args
    d2, idx, ok = neighbors.knn(q, t, v, k=K, radius=3.0, select="approx")
    s = jnp.sum(jnp.where(ok, d2, 0))
    return (q + s * 1e-20, acc + s)
timeit("engine knn approx", b_engine, (q0, jnp.zeros(())), lambda a: a[1])

# distance matrix only (coordinate diffs)
def b_dist(args):
    q, acc = args
    d2 = sum((q[:, c:c+1] - t[None, :, c])**2 for c in range(3))
    s = jnp.sum(d2) * 1e-9
    return (q + s * 1e-20, acc + s)
timeit("dist only (coord diffs)", b_dist, (q0, jnp.zeros(())), lambda a: a[1])

# matmul-form distance (MXU)
t2 = jnp.sum(t * t, axis=1)
def b_mm(args):
    q, acc = args
    d2 = (jnp.sum(q*q, 1)[:, None] + t2[None, :] - 2.0 * (q @ t.T))
    s = jnp.sum(d2) * 1e-9
    return (q + s * 1e-20, acc + s)
timeit("dist matmul f32", b_mm, (q0, jnp.zeros(())), lambda a: a[1])

# selection only
d2c = sum((q0[:, c:c+1] - t[None, :, c])**2 for c in range(3))
def b_sel(args):
    d2, acc = args
    nd, idx = jax.lax.approx_min_k(d2, K)
    s = jnp.sum(nd) * 1e-9
    return (d2 + s * 1e-20, acc + s)
timeit("approx_min_k only", b_sel, (d2c, jnp.zeros(())), lambda a: a[1])

def b_topk(args):
    d2, acc = args
    nd, idx = jax.lax.top_k(-d2, K)
    s = jnp.sum(nd) * 1e-9
    return (d2 + s * 1e-20, acc + s)
timeit("top_k only", b_topk, (d2c, jnp.zeros(())), lambda a: a[1])

# fused: matmul dist + approx_min_k
def b_mmsel(args):
    q, acc = args
    d2 = (jnp.sum(q*q, 1)[:, None] + t2[None, :] - 2.0 * (q @ t.T))
    nd, idx = jax.lax.approx_min_k(d2, K)
    s = jnp.sum(nd) * 1e-9
    return (q + s * 1e-20, acc + s)
timeit("matmul + approx_min_k", b_mmsel, (q0, jnp.zeros(())), lambda a: a[1])
