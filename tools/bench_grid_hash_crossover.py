"""Grid-hash vs dense correspondence search at map scale (VERDICT r3 item 5):
measure the crossover where the 27-cell bucket gather beats the fused dense
distance+select scan, on voxel-downsampled maps from 65k to 1M points.

Workload = the freeze-mode IMLS candidate search the map path runs per frame:
2048 queries, k=20, r=3. Map geometry mimics a voxel map (0.3 m min spacing,
urban mix of ground + walls) so per-cell occupancy matches production.
"""
import numpy as np
import jax, jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.devtime import devtime
from plo_tpu.ops import neighbors, grid_hash

K, Q, R = 20, 2048, 3.0
CELL = 1.5  # map.grid_cell default
VOXEL = 0.3


def voxel_map_cloud(n_target: int, seed: int) -> np.ndarray:
    """~n_target points with >= VOXEL spacing: ground strips + wall panels."""
    rng = np.random.default_rng(seed)
    pts = []
    count = 0
    extent = max(80.0, np.sqrt(n_target) * VOXEL * 1.1)
    while count < n_target:
        if rng.random() < 0.5:  # ground patch
            w = rng.uniform(10, 30)
            x0, y0 = rng.uniform(-extent, extent, 2)
            nx = int(w / VOXEL)
            gx, gy = np.meshgrid(np.arange(nx), np.arange(nx), indexing="ij")
            p = np.stack([x0 + gx.ravel() * VOXEL, y0 + gy.ravel() * VOXEL,
                          np.full(gx.size, rng.uniform(0, 0.3))], 1)
        else:  # wall panel
            w, h = rng.uniform(5, 20), rng.uniform(3, 12)
            x0, y0 = rng.uniform(-extent, extent, 2)
            ang = rng.uniform(0, np.pi)
            nu, nv = int(w / VOXEL), int(h / VOXEL)
            gu, gv = np.meshgrid(np.arange(nu), np.arange(nv), indexing="ij")
            u = gu.ravel() * VOXEL
            p = np.stack([x0 + u * np.cos(ang), y0 + u * np.sin(ang),
                          gv.ravel() * VOXEL], 1)
        pts.append(p)
        count += len(p)
    pts = np.concatenate(pts)[:n_target]
    return (pts + rng.normal(0, 0.02, pts.shape)).astype(np.float32)


def main():
    rows = []
    for n in (65536, 131072, 262144, 524288, 1048576):
        cloud = voxel_map_cloud(n, seed=1)
        xyz = jnp.asarray(cloud)
        valid = jnp.ones((n,), bool)
        qidx = np.random.default_rng(2).integers(0, n, Q)
        q0 = jnp.asarray(cloud[qidx] + 0.1)

        def body_dense(a):
            q, acc = a
            d2, idx, ok = neighbors.knn(q, xyz, valid, k=K, radius=R)
            s = jnp.sum(jnp.where(ok, d2, 0))
            return (q + s * 1e-20, acc + s)
        ms_dense = devtime(body_dense, (q0, jnp.zeros(())), fetch=lambda a: a[1])

        n_buckets = 1 << 17 if n <= 262144 else 1 << 19
        gh = grid_hash.build(xyz, valid, CELL, n_buckets)
        jax.block_until_ready(gh.xyz_sorted)

        def body_grid(a):
            q, acc = a
            d2, idx, ok = grid_hash.knn(gh, q, K, R, m=128)
            s = jnp.sum(jnp.where(ok, d2, 0))
            return (q + s * 1e-20, acc + s)
        ms_grid = devtime(body_grid, (q0, jnp.zeros(())), fetch=lambda a: a[1])

        # correctness spot-check: same neighbor sets within min(R, CELL)
        d2a, ia, oka = neighbors.knn(q0[:256], xyz, valid, k=K, radius=min(R, CELL))
        d2b, ib, okb = grid_hash.knn(gh, q0[:256], K, min(R, CELL), m=128)
        agree = float(jnp.mean(jnp.isclose(
            jnp.where(oka, d2a, -1), jnp.where(okb, d2b, -1), atol=1e-4)))

        def body_build(a):
            q, acc = a
            g2 = grid_hash.build(xyz + q * 1e-20, valid, CELL, n_buckets)
            s = g2.starts.sum().astype(jnp.float32)
            return (q + s * 1e-20, acc + s)
        ms_build = devtime(body_build, (jnp.zeros(()), jnp.zeros(())),
                           fetch=lambda a: a[1])

        rows.append((n, ms_dense, ms_grid, ms_build, agree))
        print(f"map {n:>8}: dense {ms_dense:7.2f} ms | grid {ms_grid:6.2f} ms "
              f"(+build {ms_build:6.2f}) | d2-agreement {agree:.3f}", flush=True)

    print("\ncrossover:", next((r[0] for r in rows if r[2] < r[1]), "none"))


if __name__ == "__main__":
    main()
