import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
from tools.devtime import devtime
from plo_tpu import config as cfgmod
from plo_tpu.io import synthetic
from plo_tpu.ops import preprocess as pre_ops, normals as normals_ops, features, sampling

world = synthetic.SyntheticWorld.corridor(seed=7, n_boxes=140, extent=120.0)
scans, _ = synthetic.synthetic_sequence(1, n_scans=64, azimuth_steps=900, seed=11, world=world)
CAP = 65536
pts = np.zeros((CAP, 4), np.float32); n = min(len(scans[0]), CAP); pts[:n] = scans[0][:n]
ptsd = jnp.asarray(pts); nv = jnp.asarray(n, jnp.int32)
sensor = cfgmod.SensorConfig(n_scans=64, azimuth_resolution=0.4)
key = jax.random.PRNGKey(0)

def chain(x, s): return x + s * 1e-20
def t(name, fn, x0=ptsd, **kw):
    def body(args):
        x, acc = args
        out = fn(x)
        s = jax.tree_util.tree_reduce(
            lambda a, b: a + (b.sum() if b.dtype != jnp.bool_ else b.sum().astype(jnp.float32)),
            out, jnp.zeros(()))
        return (chain(x, s), acc + s)
    print(f"{name:40s} {devtime(body, (x0, jnp.zeros(())), fetch=lambda a: a[1], **kw):.2f} ms")

t("preprocess (sorted)", lambda x: pre_ops.preprocess(x, nv, sensor))
rc = pre_ops.preprocess(ptsd, nv, sensor)
jax.block_until_ready(rc)
t("rasterize", lambda x: pre_ops.rasterize_range_image(
    __import__('dataclasses').replace(rc, xyz=rc.xyz + x[0, 0] * 1e-20), 64, 900)[:3], x0=ptsd)
img, xyzg, relg, occ, srcg = pre_ops.rasterize_range_image(rc, 64, 900)
jax.block_until_ready((img, xyzg, occ))
pca_cfg = cfgmod.PCAConfig()
t("grid pca", lambda x: normals_ops.compute_normals_pca_grid(
    xyzg + x[:1, :1] * 0, occ, pca_cfg, True)[0], x0=xyzg.reshape(-1, 3)[:CAP])
ev = jnp.abs(jax.random.normal(key, (57600, 3)))
vv = occ.reshape(-1)
t("presample+sample", lambda x: sampling.random_sampling(
    features.presample_geometric(ev + x[:1, :1] * 0, vv, 0.2), key, 2000)[0].astype(jnp.float32),
  x0=ev)
