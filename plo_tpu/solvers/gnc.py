"""GNC-TLS robust registration — the capability slot of the reference's
TEASER++ solver (SolveMotionEstimationProblemTeaser, solver.cpp:436-483).

The reference's Teaser path is marked broken/unverified (results.png), so full
TEASER (max-clique pruning, rotation certification) is out of the
parity-critical set; this module provides the core robust-registration
capability the config exposes: graduated non-convexity with a truncated
least-squares cost over the matched pairs (Yang et al., GNC), implemented as a
fixed-iteration reweighted-Umeyama loop on device.

Config mapping: noise_bound -> TLS noise bound epsilon; rotation_gnc_factor ->
mu schedule; rotation_max_iterations -> iteration cap (compile-time capped).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from plo_tpu import geometry as geo
from plo_tpu.solvers.icp_umeyama import umeyama


@partial(jax.jit, static_argnames=("max_iterations",))
def solve_gnc_tls(source, ref, valid, noise_bound: float = 0.01,
                  gnc_factor: float = 1.4, max_iterations: int = 64):
    """Returns (deltaTrans 4x4, ok bool)."""
    eps2 = jnp.maximum(noise_bound**2, 1e-12)
    base_w = valid.astype(jnp.float32)

    # Initial alignment + mu init from max residual (standard GNC-TLS).
    R, t = umeyama(source, ref, base_w)
    r2 = jnp.sum((source @ R.T + t - ref) ** 2, axis=-1)
    r2_max = jnp.max(jnp.where(valid, r2, 0.0))
    mu0 = jnp.maximum(1.0 / (2.0 * r2_max / eps2 - 1.0), 1e-6)

    def body(_, state):
        R, t, mu = state
        r2 = jnp.sum((source @ R.T + t - ref) ** 2, axis=-1)
        up = (mu + 1.0) / mu * eps2
        lo = mu / (mu + 1.0) * eps2
        w = jnp.where(r2 <= lo, 1.0, jnp.where(r2 >= up, 0.0,
                      jnp.sqrt(eps2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-20)) - mu))
        w = jnp.clip(w, 0.0, 1.0) * base_w
        R2, t2 = umeyama(source, ref, w + 1e-9)
        return R2, t2, mu * gnc_factor

    iters = min(max_iterations, 64)
    R, t, _ = jax.lax.fori_loop(0, iters, body, (R, t, mu0))
    ok = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t)) & (jnp.sum(valid.astype(jnp.int32)) >= 3)
    R = jnp.where(ok, R, jnp.eye(3, dtype=jnp.float32))
    t = jnp.where(ok, t, 0.0)
    return geo.make_se3(R, t), ok
