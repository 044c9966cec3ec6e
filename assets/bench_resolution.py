"""Resolution-scaling benchmark for the candidate evaluator (VERDICT r3
item 5): sustained render-and-match throughput at 160x90 / 320x180 /
640x360 working resolutions, annotating which backend served each row —
the fused Pallas raster+error kernel (padded width <= 512 and the target
maps fit VMEM, engine._eval_fn) or the two-step XLA rasterize + link_error
fallback.

Publishes the BENCHMARKS.md resolution table; quantifies what a
``-ds_factor 2`` user actually gets when the headline kernel bails.

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
    from ropes3d_tpu.ops.error import TargetBundle
    from ropes3d_tpu.prediction.engine import CandidateEvaluator
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.simulation.renderer import Renderer

    cam = [0, -1.5, 0.75, 0, 0, 0]
    intr = Intrinsics("1280_720_color")
    intr.downscale(ds)
    urdf = URDFReader()
    engine = CandidateEvaluator(cam, intr, urdf=urdf)

    # Which backend will _eval_fn hand back?  (Mirror of its sizing rule.)
    wp = -(-intr.width // 128) * 128
    hp = -(-intr.height // 8) * 8
    fused = (
        wp <= 512 and (2 * 6 + 1) * hp * wp * 4 <= 8 * 2**20
        and jax.default_backend() not in ("cpu", "gpu")
    )

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
    # fallback's [B, H, W] render intermediates stay well inside HBM.
    B = max(128, 1024 // (8 // min(ds, 8)) ** 2) if ds < 8 else 1024
    rng = np.random.default_rng(0)
    lim = urdf.joint_limits

    def fresh(n):
        return jnp.asarray(
            np.stack([
                rng.uniform(lim[:, 0], lim[:, 1], (B, 6)).astype(np.float32)
                for _ in range(n)
            ])
        )

    eval_fn = engine._eval_fn(6)

    @jax.jit
    def sustained(allb, w2c, tgt):
        def body(_, b):
            return 0.0, eval_fn(b, w2c, tgt).min()
        _, mins = jax.lax.scan(body, 0.0, allb)
        return mins

    sustained(fresh(n_iters), engine._w2c, target).block_until_ready()
    timed = fresh(n_iters)
    jax.block_until_ready(timed)
    t0 = time.perf_counter()
    sustained(timed, engine._w2c, target).block_until_ready()
    dt = time.perf_counter() - t0
    cps = B * n_iters / dt
    px = intr.width * intr.height
    print(
        f"ds={ds} ({intr.width}x{intr.height}) backend="
        f"{'fused-pallas' if fused else 'two-step-xla'} batch={B}: "
        f"{cps:,.0f} cand/s  ({cps * px / 1e9:.2f} Gpix/s)",
        flush=True,
    )
    return cps


def main():
    dss = [int(a) for a in sys.argv[1:]] or [8, 4, 2]
    for ds in dss:
        bench_ds(ds)


if __name__ == "__main__":
    main()
