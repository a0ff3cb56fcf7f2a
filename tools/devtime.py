"""Reliable device timing on the axon relay: run op N times chained inside one
jit (output feeds next input, defeating caching/parallelism), force one D2H,
and difference N vs 2N to cancel dispatch+fetch overhead."""
import time
import numpy as np
import jax, jax.numpy as jnp

def devtime(make_body, init_args, n_small=4, n_big=12, fetch=lambda a: a[0]):
    """make_body: fn(args_tuple) -> args_tuple (chained). Returns ms/iter."""
    def run_n(n):
        @jax.jit
        def f(args):
            return jax.lax.fori_loop(0, n, lambda i, a: make_body(a), args)
        out = f(init_args)
        _ = np.asarray(fetch(out))  # real D2H barrier
        t0 = time.perf_counter()
        out = f(init_args)
        s = np.asarray(fetch(out))
        return time.perf_counter() - t0
    t_small = run_n(n_small)
    t_big = run_n(n_big)
    return (t_big - t_small) / (n_big - n_small) * 1000

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-50, 50, (2048, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-50, 50, (65536, 3)).astype(np.float32))
    v = jnp.ones((65536,), bool)
    from plo_tpu.ops import neighbors

    def body(args):
        q, acc = args
        d2, idx, ok = neighbors.knn(q, t, v, k=20, radius=1.0, select="approx")
        s = jnp.sum(jnp.where(ok, d2, 0))
        return (q + s * 1e-20, acc + s)

    ms = devtime(body, (q0, jnp.zeros(())), fetch=lambda a: a[1])
    print(f"knn 2048x65536 k=20 approx: {ms:.2f} ms")

    def body_exact(args):
        q, acc = args
        d2, idx, ok = neighbors.knn(q, t, v, k=20, radius=1.0, select="exact")
        s = jnp.sum(jnp.where(ok, d2, 0))
        return (q + s * 1e-20, acc + s)
    print(f"knn 2048x65536 k=20 exact:  {devtime(body_exact, (q0, jnp.zeros(())), fetch=lambda a: a[1]):.2f} ms")

def bench_knn_variants():
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.uniform(-50, 50, (2048, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-50, 50, (65536, 3)).astype(np.float32))
    v = jnp.ones((65536,), bool)
    from plo_tpu.ops import neighbors
    for sel in ("approx", "matmul"):
        for chunk in (8192, 16384, 65536):
            def body(args, sel=sel, chunk=chunk):
                q, acc = args
                d2, idx, ok = neighbors.knn(q, t, v, k=20, radius=1.0, select=sel, chunk=chunk)
                s = jnp.sum(jnp.where(ok, d2, 0))
                return (q + s * 1e-20, acc + s)
            ms = devtime(body, (q0, jnp.zeros(())), fetch=lambda a: a[1])
            print(f"knn k=20 select={sel} chunk={chunk}: {ms:.2f} ms")
