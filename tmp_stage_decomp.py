import os, time
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
from ropes3d_tpu.config import Paths
Paths().create()
from ropes3d_tpu.simulation.lookup import RobotLookupManager
from ropes3d_tpu.prediction.synthetic import SyntheticPredictor
from ropes3d_tpu.camera import Intrinsics

cam = [0, -1.5, 0.75, 0, 0, 0]
intr = Intrinsics("1280_720_color"); intr.downscale(8)
lm = RobotLookupManager()
lm.get(str(intr), cam, 6, "SLU", divisions=np.array([24, 24, 24, 1, 1, 1]))
sp = SyntheticPredictor(cam, "1280_720_color", 8, "SLU", noise=False, seed=1)
p = sp.predictor
p._setStages()
stages = p.stages
names = [type(s).__name__ for s in stages]
print("stages:", names)

# Prepare 40 fresh targets on device.
n = 40
poses = [sp._generatePose() for _ in range(n)]
prep = p._prepare_synthetic_device()
targets = []
for po in poses:
    d, l = sp.renderer.render_batch_angles(np.asarray(po, np.float32)[None])
    targets.append(prep(d[0], l[0]))
jax.block_until_ready(targets[-1][0])

eng = p.engine
prev = None
for k in range(1, len(stages) + 1):
    sub = stages[:k]
    # compile
    out = eng.run_recipe(sub, targets[0][0], targets[0][1],
                         p.lookup_depth, p.lookup_angles)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [eng.run_recipe(sub, t[0], t[1], p.lookup_depth, p.lookup_angles)
            for t in targets]
    jax.block_until_ready(outs)
    dt = 1e3 * (time.perf_counter() - t0) / n
    d = "" if prev is None else f"  (+{dt - prev:.1f})"
    print(f"through {k:2d} {names[k-1]:<20s}: {dt:6.1f} ms/frame{d}", flush=True)
    prev = dt
