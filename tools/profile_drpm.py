import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu.solvers import drpm
from plo_tpu.solvers.build import build_system, masked_lstsq

rng = np.random.default_rng(0)
N = 2048
src = jnp.asarray(rng.uniform(-50, 50, (N, 3)).astype(np.float32))
nrm = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
nrm = nrm / jnp.linalg.norm(nrm, axis=1, keepdims=True)
ref = src + 0.01 * jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
valid = jnp.asarray(rng.random(N) < 0.9)
w = jnp.ones((N,)) / N
U = jnp.linalg.qr(jnp.asarray(rng.standard_normal((6, 6)).astype(np.float32)))[0]

def chain(x, s): return x + s * 1e-20
def t(name, fn):
    def body(args):
        x, acc = args
        out = fn(x)
        s = jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), out, jnp.zeros(()))
        return (chain(x, s), acc + s)
    print(f"{name:42s} {devtime(body, (src, jnp.zeros(())), fetch=lambda a: a[1]):.3f} ms")

t("build_system", lambda x: build_system(x, ref, nrm, valid))
t("compute_noise_estimate", lambda x: drpm.compute_noise_estimate(x, nrm, w, valid, U, 0.02, 0.05))
A, b = build_system(src, ref, nrm, valid)
t("masked_lstsq", lambda x: (masked_lstsq(A + x[0, 0] * 1e-20, b),))
t("signal_to_noise_probabilities", lambda x: (drpm.signal_to_noise_probabilities(
    U * (1 + x[0, 0] * 1e-20), jnp.eye(6), jnp.ones((6,)), U),))
t("solve_drpm full", lambda x: drpm.solve_drpm(x, ref, nrm, valid, w, 0.05, 0.02, 0.05)[:2])
