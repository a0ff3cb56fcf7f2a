import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime

rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((2048, 6)).astype(np.float32))
S = jnp.asarray(rng.standard_normal((6, 6)).astype(np.float32))
H = S @ S.T

def chain(x, s): return x + s * 1e-20

def t(name, fn, x0=A):
    def body(args):
        x, acc = args
        out = fn(x)
        s = jax.tree_util.tree_reduce(lambda a, b: a + b.sum(), out, 0.0)
        return (chain(x, s), acc + s)
    print(f"{name:40s} {devtime(body, (x0, jnp.zeros(())), fetch=lambda a: a[1]):.3f} ms")

t("svd [2048,6]", lambda x: jnp.linalg.svd(x, full_matrices=False))
t("qr [2048,6]", lambda x: jnp.linalg.qr(x))
t("svd [6,6]", lambda x: jnp.linalg.svd(x[:6, :6]))
t("eigh [6,6] of H", lambda x: jnp.linalg.eigh(x[:6, :6] @ x[:6, :6].T))

def mgs2(x):
    # CGS2 (classical Gram-Schmidt, twice) on 6 columns -> Q [N,6], R [6,6]
    q = x
    r = jnp.zeros((6, 6), x.dtype)
    for _ in range(2):
        c = q.T @ q
        # not a real MGS; placeholder cost probe: 2x [N,6]^T[N,6]
        r = r + c
    return (r,)
t("2x gram [6,6] = A^T A cost probe", mgs2)

def cgs2_qr(a):
    """Column-by-column classical Gram-Schmidt with reorthogonalization."""
    n = a.shape[1]
    qs = []
    r = jnp.zeros((n, n), a.dtype)
    for j in range(n):
        v = a[:, j]
        for _ in range(2):
            if qs:
                Q = jnp.stack(qs, axis=1)
                c = Q.T @ v
                v = v - Q @ c
        nv = jnp.linalg.norm(v)
        qs.append(v / jnp.maximum(nv, 1e-30))
    Q = jnp.stack(qs, axis=1)
    R = Q.T @ a
    return Q, R
t("cgs2 qr [2048,6] (unrolled)", cgs2_qr)
