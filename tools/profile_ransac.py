import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu.solvers import ransac as rn
from plo_tpu.solvers.drpm import solve_drpm
from plo_tpu.solvers.build import build_system
from plo_tpu import geometry as geo

rng = np.random.default_rng(0)
N, M = 2048, 1000
src = jnp.asarray(rng.uniform(-50, 50, (N, 3)).astype(np.float32))
nrm = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
ref = src + 0.01 * jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
valid = jnp.asarray(rng.random(N) < 0.9)
key = jax.random.PRNGKey(0)
w = jnp.ones((N,)) / N

def chain(x, s): return x + s * 1e-20

def body_fps(args):
    x, acc = args
    idx = rn._fps3_batched(x, valid, key, M)
    s = idx.sum().astype(jnp.float32)
    return (chain(x, s), acc + s)
print(f"fps3_batched M=1000: {devtime(body_fps, (src, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

A, b = build_system(src, ref, nrm, valid)
seeds = rn._fps3_batched(src, valid, key, M)
x6 = jax.vmap(rn._solve_seed)(A[seeds], b[seeds])
R_all = geo.exp_so3(x6[:, :3]); t_all = x6[:, 3:]
jax.block_until_ready((R_all, t_all))

def body_seed(args):
    x, acc = args
    xx = jax.vmap(rn._solve_seed)(A[seeds], b[seeds] + x[0, 0] * 1e-20)
    s = xx.sum()
    return (chain(x, s), acc + s)
print(f"seed solves (1000x 3x6): {devtime(body_seed, (src, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

def body_score(args):
    x, acc = args
    cnt = rn._score_hypotheses(x, ref, nrm, valid, R_all, t_all, 0.2, M)
    s = cnt.sum().astype(jnp.float32)
    return (chain(x, s), acc + s)
print(f"score_hypotheses: {devtime(body_score, (src, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

def body_drpm(args):
    x, acc = args
    T, ok, p = solve_drpm(x, ref, nrm, valid, w, 0.05, 0.02, 0.05)
    s = T.sum()
    return (chain(x, s), acc + s)
print(f"solve_drpm (SVD 2048x6): {devtime(body_drpm, (src, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

def body_full(args):
    x, acc = args
    T, ok = rn.solve_ransac(x, ref, nrm, valid, key, M, 0.2, 0.9, 1.0, "DRPM",
                            0.02, 0.05, 0.02, 0.05)
    s = T.sum()
    return (chain(x, s), acc + s)
print(f"solve_ransac full: {devtime(body_full, (src, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")
