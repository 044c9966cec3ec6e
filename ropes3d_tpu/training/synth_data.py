"""Device-side synthetic training-data pipeline for the segmenter.

The reference fine-tunes from a COCO-pretrained Mask R-CNN downloaded off
the network (robotpose/training/__init__.py:10-15).  With no network and no
real-photo corpus, the TPU build closes the sim-to-real gap with *domain
randomization* instead: shaded robot renders with random per-link tints,
random camera jitter, cluttered random backgrounds (gradients, shapes,
noise), and photometric jitter — composed **entirely on device**.  The
single-core host only drives the step loop; every pixel of every training
batch is rendered, composited and annotated by XLA (a host generator
bottlenecks a 512x512 ResNet-101 step hopelessly).

Round-1 negative result honoured (ROADMAP): wide camera-pose jitter trades
in-distribution IoU — jitter defaults stay at 0.15 with targeted appearance
randomization instead.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CAMERA_POSE
from ..camera import Intrinsics
from ..models import MaskRCNNConfig
from ..robot import MeshLoader, URDFReader
from ..robot.kinematics import make_fk
from ..ops.rasterizer import (
    rasterize_shaded,
    transform_vertices,
    triangle_setup,
    triangle_shade,
)

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


class DeviceSynthPipeline:
    """Jitted generator of Mask R-CNN training batches from the renderer.

    ``batch(key, batch_size)`` -> dict(images [B,H,W,3] normalized f32,
    boxes [B,G,4], classes [B,G] i32, masks [B,G,H,W] f32), all on device.
    """

    def __init__(
        self,
        cfg: MaskRCNNConfig,
        urdf: URDFReader = None,
        camera_pose=DEFAULT_CAMERA_POSE,
        base_intrin: str = "1280_720_color",
        camera_jitter: float = 0.15,
        num_distractors: int = 6,
        max_tris_per_link: int = None,
        dist_range: Tuple[float, float] = (1.0, 1.0),
        hard_clutter: bool = False,
    ):
        """``dist_range``: per-sample uniform scale on the camera position
        vector — <1 moves the camera closer.  Scale augmentation targets
        the small-wrist-link failure mode (ROADMAP round-1: prefer wrist
        close-ups over wider global pose jitter)."""
        self.cfg = cfg
        self.u_reader = urdf or URDFReader()
        self.base_cam = np.asarray(camera_pose, np.float32)
        self.camera_jitter = float(camera_jitter)
        self.num_distractors = int(num_distractors)
        self.dist_range = (float(dist_range[0]), float(dist_range[1]))
        # hard_clutter (training-only knob; the IoU eval harness keeps the
        # round-3/4 distribution): distractors get per-shape texture
        # (gradient + stripes + speckle) and a third shape class — capsules,
        # the robot-link lookalike — so flat-color-blob rejection stops
        # being a sufficient strategy.
        self.hard_clutter = bool(hard_clutter)

        mh, mw = cfg.image_hw
        # Render at the letterboxed-into-model-frame resolution directly:
        # scale the camera intrinsics so the full frame fits (top-left
        # anchored, matching Segmenter.preprocess letterboxing).
        base = Intrinsics(base_intrin)
        scale = min(mh / base.height, mw / base.width)
        self.rh = int(round(base.height * scale))
        self.rw = int(round(base.width * scale))
        f = (base.f[0] * scale, base.f[1] * scale)
        pp = (base.pp[0] * scale, base.pp[1] * scale)
        self._intrin = (float(f[0]), float(f[1]), float(pp[0]), float(pp[1]))

        loader = MeshLoader(max_tris_per_link=max_tris_per_link, urdf=self.u_reader)
        v, ids, valid = loader.scene.flat_packed()
        self._verts = jnp.asarray(v)
        self._ids = jnp.asarray(ids)
        self._valid = jnp.asarray(valid)
        self.num_links = loader.scene.num_links
        self._fk = make_fk(self.u_reader)
        self.joint_limits = np.asarray(self.u_reader.joint_limits, np.float32)

    # ------------------------------------------------------------ internals
    def _render_one(self, angles, cam_pose6):
        """Shaded render of one pose:
        -> (lid [rh,rw] i32, shade [rh,rw] u8, depth [rh,rw] f32)."""
        from ..prediction.camera_pose import w2c_from_pose_jnp

        w2c = w2c_from_pose_jnp(cam_pose6)
        poses = self._fk(angles[None])[0][: self.num_links]
        cam_verts = transform_vertices(self._verts, self._ids, poses, w2c)
        fx, fy, cx, cy = self._intrin
        coeffs, qrange, _, _ = triangle_setup(cam_verts, self._valid, fx, fy, cx, cy)
        shade = triangle_shade(cam_verts)
        depth, lid, shade_map = rasterize_shaded(
            coeffs, qrange, self._ids.astype(jnp.int32), shade, self.rh, self.rw
        )
        # Misses rasterize to depth 0; z-buffer compositing wants +inf.
        depth = jnp.where(lid >= 0, depth, jnp.inf)
        return lid, shade_map, depth

    def _compose_one(self, key, angles, cam_pose6):
        """Render + z-buffer composite one domain-randomized RGB(-D) sample.

        Every element carries a depth: the background is a far plane,
        distractors sit at random distances (some CLOSER than the robot —
        real occluders, excluded from the GT masks), and the robot at its
        rendered depth.  Compositing is a straight z-buffer, so the depth
        channel an RGB-D model sees is geometrically consistent with the
        color — no 'nearest thing is the robot' shortcut survives
        training."""
        cfg = self.cfg
        mh, mw = cfg.image_hw
        lid, shade, rdepth = self._render_one(angles, cam_pose6)
        ks = jax.random.split(key, 16)

        rows = jnp.arange(self.rh, dtype=jnp.float32)[:, None, None]
        cols = jnp.arange(self.rw, dtype=jnp.float32)[None, :, None]

        # --- background: solid color + 2-D gradient + speckle noise, on a
        # sloped far plane (2.5-5 m) in depth.
        bg = jax.random.uniform(ks[0], (3,), minval=0.0, maxval=255.0)
        gx = jax.random.uniform(ks[1], (), minval=-80.0, maxval=80.0)
        gy = jax.random.uniform(ks[2], (), minval=-80.0, maxval=80.0)
        img = (
            bg[None, None]
            + cols / self.rw * gx
            + rows / self.rh * gy
            + jax.random.normal(ks[3], (self.rh, self.rw, 3)) * 25.0
        )
        bgz = jax.random.uniform(ks[10], (), minval=2.5, maxval=5.0)
        bgs = jax.random.uniform(ks[11], (2,), minval=-0.8, maxval=0.8)
        zbuf = (
            bgz
            + cols[..., 0] / self.rw * bgs[0]
            + rows[..., 0] / self.rh * bgs[1]
        )

        # --- distractor shapes (rectangles + ellipses; + capsules and
        # per-shape texture under hard_clutter) at random depths 0.7-4.5 m;
        # z-buffered, so near ones occlude the robot later.
        dk = jax.random.split(ks[4], self.num_distractors)
        yy_, xx_ = rows[..., 0], cols[..., 0]
        for i in range(self.num_distractors):
            kk = jax.random.split(dk[i], 14)
            cy_ = jax.random.uniform(kk[0], (), minval=0.0, maxval=self.rh)
            cx_ = jax.random.uniform(kk[1], (), minval=0.0, maxval=self.rw)
            hh = jax.random.uniform(kk[2], (), minval=8.0, maxval=self.rh / 3)
            ww = jax.random.uniform(kk[3], (), minval=8.0, maxval=self.rw / 3)
            col = jax.random.uniform(kk[4], (3,), minval=0.0, maxval=255.0)
            is_ellipse = jax.random.bernoulli(kk[5])
            z = jax.random.uniform(kk[6], (), minval=0.7, maxval=4.5)
            dy = (yy_ - cy_) / hh
            dx = (xx_ - cx_) / ww
            inside = jnp.where(
                is_ellipse,
                dy * dy + dx * dx <= 1.0,
                (jnp.abs(dy) <= 1.0) & (jnp.abs(dx) <= 1.0),
            )
            if self.hard_clutter:
                # Capsule (thick line segment): the link-shaped occluder.
                ang = jax.random.uniform(kk[7], (), minval=0.0, maxval=np.pi)
                ln = jax.random.uniform(kk[8], (), minval=20.0,
                                        maxval=self.rh * 0.6)
                rad = jax.random.uniform(kk[9], (), minval=5.0,
                                         maxval=self.rh / 8)
                ex, ey = jnp.cos(ang) * ln / 2, jnp.sin(ang) * ln / 2
                # distance from each pixel to the segment [c-e, c+e]
                py, px = yy_ - cy_, xx_ - cx_
                t = jnp.clip((py * ey + px * ex) / (ln * ln / 4 + 1e-6),
                             -1.0, 1.0)
                dseg = jnp.sqrt((py - t * ey) ** 2 + (px - t * ex) ** 2)
                shape_kind = jax.random.randint(kk[10], (), 0, 3)
                inside = jnp.where(shape_kind == 2, dseg <= rad, inside)
                # Per-shape texture: shading gradient (fake 3-D), stripes,
                # speckle — all over the base color.
                gdir = jax.random.uniform(kk[11], (2,), minval=-1.0,
                                          maxval=1.0)
                shade_g = 0.55 + 0.45 * jnp.clip(
                    (py * gdir[0] + px * gdir[1]) / (self.rh / 2), -1, 1
                )
                sfreq = jax.random.uniform(kk[12], (), minval=0.05,
                                           maxval=0.6)
                stripes = jnp.where(
                    jax.random.bernoulli(kk[13], 0.4),
                    0.75 + 0.25 * jnp.sign(
                        jnp.sin(sfreq * (py * gdir[1] - px * gdir[0]))
                    ),
                    1.0,
                )
                tex = (shade_g * stripes)[..., None]
                shape_rgb = jnp.clip(col[None, None] * tex, 0.0, 255.0)
            else:
                shape_rgb = jnp.broadcast_to(
                    col[None, None], (self.rh, self.rw, 3)
                )
            closer = inside & (z < zbuf)
            img = jnp.where(closer[..., None], shape_rgb, img)
            zbuf = jnp.where(closer, z, zbuf)

        # --- robot: shaded grayscale x random per-link tint, z-buffered
        # against the scene (a nearer distractor occludes it).
        tint = jax.random.uniform(
            ks[5], (self.num_links, 3), minval=60.0, maxval=255.0
        )
        shade_f = 0.25 + 0.75 * shade.astype(jnp.float32) / 255.0
        robot_rgb = tint[jnp.clip(lid, 0, self.num_links - 1)] * shade_f[..., None]
        visible = (lid >= 0) & (rdepth < zbuf)
        img = jnp.where(visible[..., None], robot_rgb, img)
        zbuf = jnp.where(visible, rdepth, zbuf)

        # --- photometric jitter + sensor noise (+ occasional soft blur)
        bright = jax.random.uniform(ks[6], (), minval=-30.0, maxval=30.0)
        contrast = jax.random.uniform(ks[7], (), minval=0.8, maxval=1.2)
        img = (img - img.mean()) * contrast + img.mean() + bright
        img = img + jax.random.normal(ks[8], img.shape) * 12.0
        blur = jax.random.bernoulli(ks[9], 0.3)
        soft = (
            img
            + jnp.roll(img, 1, 0) + jnp.roll(img, -1, 0)
            + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1)
        ) / 5.0
        img = jnp.where(blur, soft, img)
        img = jnp.clip(img, 0.0, 255.0)
        img = (img - IMAGENET_MEAN) / IMAGENET_STD

        if cfg.in_channels == 4:
            # --- depth-channel sensor model: distance-growing noise,
            # speckle holes, extra holes at depth discontinuities
            # (stereo/ToF failure mode), 1 mm quantisation — and the whole
            # channel dropped outright sometimes so the color pathway
            # stays load-bearing (graceful RGB-only degradation).
            from ..models.inference import normalize_depth

            d = jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)
            d = d + jax.random.normal(ks[12], d.shape) * (0.004 * d * d)
            gy_ = jnp.abs(jnp.diff(d, axis=0, prepend=d[:1]))
            gx_ = jnp.abs(jnp.diff(d, axis=1, prepend=d[:, :1]))
            edge = (gy_ + gx_) > 0.08
            speckle = jax.random.uniform(ks[13], d.shape) < 0.03
            edge_drop = edge & (jax.random.uniform(ks[14], d.shape) < 0.5)
            d = jnp.where(speckle | edge_drop, 0.0, d)
            d = jnp.round(d * 1000.0) / 1000.0
            drop_all = jax.random.bernoulli(ks[15], 0.08)
            d = jnp.where(drop_all, 0.0, d)
            img = jnp.concatenate([img, normalize_depth(d)[..., None]], -1)

        # --- letterbox into the model frame (top-left, like preprocess):
        # padding is normalised BLACK (+ hole depth), matching
        # Segmenter.preprocess and the pre-RGB-D bootv2 training runs.
        pad = [float(v) for v in -IMAGENET_MEAN / IMAGENET_STD]
        if cfg.in_channels == 4:
            from ..models.inference import DEPTH_HOLE

            pad.append(DEPTH_HOLE)
        canvas = jnp.broadcast_to(
            jnp.asarray(pad, jnp.float32), (mh, mw, cfg.in_channels)
        )
        canvas = canvas.at[: self.rh, : self.rw].set(img)

        # --- targets: per-link masks, boxes, classes (first 6 links)
        G = cfg.max_gt
        masks = jnp.zeros((G, mh, mw), jnp.float32)
        boxes = jnp.zeros((G, 4), jnp.float32)
        classes = jnp.zeros((G,), jnp.int32)
        for li in range(min(6, self.num_links)):
            # Modal (visible-only) masks: pixels occluded by a nearer
            # distractor are NOT robot GT — the downstream error function
            # multiplies masks into observed depth, so a mask bleeding onto
            # an occluder would inject the occluder's depth as robot depth.
            m = ((lid == li) & visible).astype(jnp.float32)
            mm = jnp.zeros((mh, mw), jnp.float32).at[: self.rh, : self.rw].set(m)
            area = mm.sum()
            rows_any = mm.sum(axis=1) > 0
            cols_any = mm.sum(axis=0) > 0
            y1 = jnp.argmax(rows_any).astype(jnp.float32)
            y2 = (mh - jnp.argmax(rows_any[::-1])).astype(jnp.float32)
            x1 = jnp.argmax(cols_any).astype(jnp.float32)
            x2 = (mw - jnp.argmax(cols_any[::-1])).astype(jnp.float32)
            ok = area >= 4.0
            masks = masks.at[li].set(jnp.where(ok, mm, 0.0))
            boxes = boxes.at[li].set(
                jnp.where(ok, jnp.stack([y1, x1, y2, x2]), jnp.zeros(4))
            )
            classes = classes.at[li].set(jnp.where(ok, li + 1, 0))
        return canvas, boxes, classes, masks

    @functools.partial(jax.jit, static_argnames=("self", "batch_size"))
    def batch(self, key, batch_size: int):
        """Generate one training batch on device."""
        lim = jnp.asarray(self.joint_limits)
        base = jnp.asarray(self.base_cam)
        keys = jax.random.split(key, batch_size)

        def one(k):
            ka, kc, kd, ks = jax.random.split(k, 4)
            angles = jax.random.uniform(
                ka, (6,), minval=lim[:, 0], maxval=lim[:, 1]
            )
            cam = base + jax.random.uniform(
                kc, (6,), minval=-self.camera_jitter, maxval=self.camera_jitter
            )
            s = jax.random.uniform(
                kd, (), minval=self.dist_range[0], maxval=self.dist_range[1]
            )
            cam = cam.at[:3].multiply(s)
            return self._compose_one(ks, angles, cam)

        images, boxes, classes, masks = jax.vmap(one)(keys)
        return {
            "images": images,
            "boxes": boxes,
            "classes": classes,
            "masks": masks,
        }
