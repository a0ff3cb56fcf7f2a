"""Trimmed and weighted least-squares solvers (solver.cpp:74-220)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from plo_tpu.solvers.build import build_system, masked_lstsq, se3_from_x


@jax.jit
def _rank_by_abs(values: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-based) of each valid element by ascending |value|; invalid
    elements get rank N (out of range)."""
    n = values.shape[0]
    key = jnp.where(valid, jnp.abs(values), jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(valid, rank, n)


@jax.jit
def solve_ls_trimmed(source, ref, normal, valid, threshold: float):
    """SolveMotionEstimationProblemLS (solver.cpp:74-166): initial LS solve,
    then drop BOTH the smallest and largest `threshold` fraction of
    |residuals| (reference quirk — both tails, :117-137) and re-solve.

    Returns (deltaTrans 4x4, ok bool)."""
    A, b = build_system(source, ref, normal, valid)
    x0 = masked_lstsq(A, b)
    residuals = A @ x0 - b

    n_valid = jnp.sum(valid.astype(jnp.int32))
    rank = _rank_by_abs(residuals, valid)
    lower = (threshold * n_valid.astype(jnp.float32)).astype(jnp.int32)
    upper = ((1.0 - threshold) * n_valid.astype(jnp.float32)).astype(jnp.int32)
    keep = valid & (rank >= lower) & (rank <= upper)

    A2, b2 = build_system(source, ref, normal, keep)
    x = masked_lstsq(A2, b2)
    ok = jnp.all(jnp.isfinite(x)) & (n_valid >= 3)
    x = jnp.where(ok, x, 0.0)
    return se3_from_x(x), ok


@jax.jit
def solve_weighted_ls(source, ref, normal, valid, weights):
    """SolveMotionEstimationProblemWeightedLS (solver.cpp:168-220): rows scaled
    by sqrt(w). Returns (deltaTrans, ok)."""
    A, b = build_system(source, ref, normal, valid)
    sw = jnp.sqrt(jnp.maximum(weights, 0.0)) * valid.astype(jnp.float32)
    x = masked_lstsq(A * sw[:, None], b * sw)
    ok = jnp.all(jnp.isfinite(x)) & (jnp.sum(valid.astype(jnp.int32)) >= 3)
    x = jnp.where(ok, x, 0.0)
    return se3_from_x(x), ok
