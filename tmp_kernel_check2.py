import os, time
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
from ropes3d_tpu.camera import Intrinsics, camera_matrices
from ropes3d_tpu.robot import URDFReader, MeshLoader
from ropes3d_tpu.robot.kinematics import make_fk
from ropes3d_tpu.ops.rasterizer import transform_vertices, triangle_setup, rasterize
from ropes3d_tpu.ops.rasterizer_pallas import rasterize_error_pallas
from ropes3d_tpu.ops.error import TargetBundle, link_error, link_error_from_parts

urdf = URDFReader(); ml = MeshLoader(urdf=urdf)
v, ids, valid = ml.scene.flat_packed()
v, ids, valid = jnp.asarray(v), jnp.asarray(ids), jnp.asarray(valid)
intr = Intrinsics("1280_720_color_8")
_, w2c = camera_matrices([0, -1.5, 0.75, 0, 0, 0]); w2c = jnp.asarray(w2c, jnp.float32)
fx, fy = intr.f; cx, cy = intr.pp
h, w = intr.height, intr.width
fk = make_fk(urdf)
rng = np.random.default_rng(0)
lim = urdf.joint_limits
def fresh(B): return rng.uniform(lim[:, 0], lim[:, 1], (B, 6)).astype(np.float32)
def setup(p):
    cv = transform_vertices(v, ids, p, w2c)
    return triangle_setup(cv, valid, float(fx), float(fy), float(cx), float(cy))

tp = jnp.asarray(fk(fresh(1)))[:, :6]
tc, tq, tv, _ = jax.vmap(setup)(tp)
t_d, t_l = rasterize(tc[0], tq[0], ids, h, w)
t_d, t_l = np.asarray(t_d), np.asarray(t_l)
masks = np.stack([t_l == i for i in range(6)])
target = TargetBundle(jnp.asarray(masks), jnp.asarray(masks * t_d[None], jnp.float32),
                      jnp.asarray(masks.any((1, 2))), jnp.asarray(t_d, jnp.float32))
la = jnp.asarray((np.arange(6) >= 1) & (np.arange(6) < 6))

B = 64
angles = fresh(B)
poses = jnp.asarray(fk(angles))[:, :6]
coeffs, qrange, vrange, _ = jax.vmap(setup)(poses)
parts = rasterize_error_pallas(coeffs, qrange, vrange, ids.astype(jnp.int32),
                               target.masks, target.masked_depth, target.depth, h, w)
e_fused = np.asarray(link_error_from_parts(parts, target, la, h * w))
e_ref = []
for b in range(B):
    d_x, l_x = rasterize(coeffs[b], qrange[b], ids, h, w)
    e_ref.append(float(link_error(target, d_x, l_x, la)))
e_ref = np.array(e_ref)
print("tile-culled fused max rel diff:",
      float(np.abs(e_fused - e_ref).max() / (np.abs(e_ref).max() + 1e-9)))

@jax.jit
def eval_fused(angles):
    p = fk(angles)[:, :6]
    c, q, vr, _ = jax.vmap(setup)(p)
    parts = rasterize_error_pallas(c, q, vr, ids.astype(jnp.int32),
                                   target.masks, target.masked_depth, target.depth, h, w)
    return link_error_from_parts(parts, target, la, h * w)

for Bt in (3, 8, 64, 1024):
    a0 = fresh(Bt)
    jax.block_until_ready(eval_fused(a0))
    batches = [fresh(Bt) for _ in range(12)]
    t0 = time.perf_counter()
    for bb in batches:
        r = eval_fused(bb)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"fused eval B={Bt}: {1e3*dt/12:.2f} ms/call, {Bt*12/dt:.0f} cand/s")
