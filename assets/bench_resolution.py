"""Resolution-scaling benchmark for the candidate evaluator (VERDICT r3
item 5): sustained render-and-match throughput at 160x90 / 320x180 /
640x360 working resolutions, for BOTH backends at each resolution —

  fused     the Pallas raster+error kernel (VMEM-resident targets up to
            padded width 512, per-tile HBM streaming beyond — the TPU
            production path, engine._eval_fn)
  two-step  XLA rasterize -> link_error (the non-TPU fallback)

Publishes the BENCHMARKS.md resolution table.

Usage: python assets/bench_resolution.py [ds_factors...]  (default: 8 4 2)
"""

import os
import sys
import time

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])

import numpy as np


def bench_ds(ds: int, n_iters: int = 12):
    import jax
    import jax.numpy as jnp

    from ropes3d_tpu.camera import Intrinsics
    from ropes3d_tpu.ops.error import TargetBundle, link_error
    from ropes3d_tpu.prediction.engine import CandidateEvaluator
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.simulation.renderer import Renderer

    cam = [0, -1.5, 0.75, 0, 0, 0]
    intr = Intrinsics("1280_720_color")
    intr.downscale(ds)
    urdf = URDFReader()
    engine = CandidateEvaluator(cam, intr, urdf=urdf)

    rend = Renderer(camera_pose=cam, camera_intrin=str(intr))
    rend.setJointAngles(np.array([0.4, 0.1, 0.6, 0, 0, 0]))
    depth, lid = rend.render_ids()
    masks = np.stack([lid == i for i in range(6)])
    target = TargetBundle(
        jnp.asarray(masks),
        jnp.asarray(masks * depth[None], jnp.float32),
        jnp.asarray(masks.any((1, 2))),
        jnp.asarray(depth, jnp.float32),
    )

    # Scale the candidate batch down with resolution so the two-step
    # backend's [B, H, W] render intermediates stay well inside HBM.
    B = 1024 if ds >= 8 else (512 if ds == 4 else 128)
    rng = np.random.default_rng(0)
    lim = urdf.joint_limits

    def fresh(n):
        return jnp.asarray(
            np.stack([
                rng.uniform(lim[:, 0], lim[:, 1], (B, 6)).astype(np.float32)
                for _ in range(n)
            ])
        )

    la = jnp.asarray((np.arange(6) >= 1) & (np.arange(6) < 6))
    render = engine._render_fn(6, 1)

    def twostep(angles, w2c, tgt):
        d, l = render(angles, w2c)
        return jax.vmap(lambda dd, ll: link_error(tgt, dd, ll, la, None))(d, l)

    wp = -(-intr.width // 128) * 128
    fused_name = "fused-resident" if wp <= 512 else "fused-streaming"
    backends = [(fused_name, engine._eval_fn(6)), ("two-step-xla", twostep)]
    px = intr.width * intr.height
    out = {}
    for name, eval_fn in backends:
        @jax.jit
        def sustained(allb, w2c, tgt, _f=eval_fn):
            def body(_, b):
                return 0.0, _f(b, w2c, tgt).min()
            _, mins = jax.lax.scan(body, 0.0, allb)
            return mins

        sustained(fresh(n_iters), engine._w2c, target).block_until_ready()
        timed = fresh(n_iters)
        jax.block_until_ready(timed)
        t0 = time.perf_counter()
        sustained(timed, engine._w2c, target).block_until_ready()
        dt = time.perf_counter() - t0
        cps = B * n_iters / dt
        out[name] = cps
        print(
            f"ds={ds} ({intr.width}x{intr.height}) {name} batch={B}: "
            f"{cps:,.0f} cand/s  ({cps * px / 1e9:.2f} Gpix/s)",
            flush=True,
        )
    return out


def main():
    dss = [int(a) for a in sys.argv[1:]] or [8, 4, 2]
    for ds in dss:
        bench_ds(ds)


if __name__ == "__main__":
    main()
