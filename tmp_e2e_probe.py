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

# readback latency: tiny array pull, repeated
x = jnp.arange(6.0) + 1
jax.block_until_ready(x)
ts = []
for i in range(20):
    y = x * (i + 1)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    np.asarray(y)
    ts.append(1e3 * (time.perf_counter() - t0))
print("readback 6-float p50:", np.percentile(ts, 50), "ms")

for mode in ("parity", "fast"):
    sp = SyntheticPredictor(cam, "1280_720_color", 8, "SLU", noise=False, seed=1)
    sp.predictor.search_mode = mode
    p = sp.predictor
    n = 60
    poses = [sp._generatePose() for _ in range(n)]
    inputs = []
    for po in poses:
        d, l = sp.renderer.render_batch_angles(np.asarray(po, np.float32)[None])
        inputs.append((jnp.array(d[0]), jnp.array(l[0])))
    jax.block_until_ready(inputs[-1])
    p.run_synthetic(*inputs[0])  # compile

    # serial latency (what bench measures)
    lat = []
    errs = []
    for po, (d, l) in zip(poses, inputs):
        t0 = time.perf_counter()
        pred = p.run_synthetic(d, l)
        lat.append(1e3 * (time.perf_counter() - t0))
        errs.append(np.degrees(np.abs(pred - po))[:3])
    errs = np.array(errs)

    # pipelined device time (dispatch all, block at end)
    fused = p._synth_run
    t0 = time.perf_counter()
    outs = [fused(d, l, p.lookup_depth, p.lookup_angles) for (d, l) in inputs]
    jax.block_until_ready(outs)
    dev_ms = 1e3 * (time.perf_counter() - t0) / n
    print(f"{mode}: serial p50 {np.percentile(lat,50):.1f} ms, pipelined/frame "
          f"{dev_ms:.1f} ms, med err {np.median(errs):.3f} deg, "
          f"p90 err {np.percentile(errs,90):.3f} deg")
