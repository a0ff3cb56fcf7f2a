"""Per-iteration ICP pieces at bench shapes: cached IMLS eval, RANSAC-1000,
DRPM final, full solve."""
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu.ops import matching
from plo_tpu import config as cfgmod
from plo_tpu.solvers import solve_ransac, solve_ls_trimmed, solve_drpm
from plo_tpu.cloud import PointCloud
import dataclasses as dc

rng = np.random.default_rng(0)
Q, T, K = 2048, 57600, 20
src_xyz = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))
src_nrm = jnp.asarray(np.tile([0,0,1.0], (Q,1)).astype(np.float32))
tgt_xyz = jnp.asarray(rng.uniform(-50, 50, (T, 3)).astype(np.float32))
tgt_nrm = jnp.asarray(np.tile([0,0,1.0], (T,1)).astype(np.float32))
tval = jnp.ones((T,), bool)
nidx = jnp.asarray(rng.integers(0, T, (Q, K)).astype(np.int32))
nfound = jnp.ones((Q, K), bool)
imls = cfgmod.IMLSConfig()
src = dc.replace(PointCloud.from_xyz(src_xyz), normal=src_nrm)
tgt = dc.replace(PointCloud.from_xyz(tgt_xyz), normal=tgt_nrm)

def b_eval(args):
    s, acc = args
    res = matching.imls_project_cached(dc.replace(src, xyz=s), tgt, imls, (nidx, nfound))
    t_ = jnp.sum(res.y) * 1e-9
    return (s + t_ * 1e-20, acc + t_)
print(f"cached IMLS eval: {devtime(b_eval, (src_xyz, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms", flush=True)

y = jnp.asarray(rng.uniform(-50, 50, (Q, 3)).astype(np.float32))
n = src_nrm
valid = jnp.ones((Q,), bool)
key = jax.random.PRNGKey(0)

def b_ransac(args):
    s, acc = args
    delta, ok = solve_ransac(s, y, n, valid, key, 1000, 0.2, 0.95, 0.648,
                             "DRPM", 0.02, 0.05, 0.02, 0.05)
    t_ = jnp.sum(delta) * 1e-9
    return (s + t_ * 1e-20, acc + t_)
print(f"RANSAC-1000+DRPM solve: {devtime(b_ransac, (src_xyz, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms", flush=True)

def b_ransac_ls(args):
    s, acc = args
    delta, ok = solve_ransac(s, y, n, valid, key, 1000, 0.2, 0.95, 0.648,
                             "LS", 0.02, 0.05, 0.02, 0.05)
    t_ = jnp.sum(delta) * 1e-9
    return (s + t_ * 1e-20, acc + t_)
print(f"RANSAC-1000+LS solve:  {devtime(b_ransac_ls, (src_xyz, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms", flush=True)

def b_ls(args):
    s, acc = args
    delta, ok = solve_ls_trimmed(s, y, n, valid, 0.02)
    t_ = jnp.sum(delta) * 1e-9
    return (s + t_ * 1e-20, acc + t_)
print(f"trimmed LS solve: {devtime(b_ls, (src_xyz, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms", flush=True)
