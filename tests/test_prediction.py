"""End-to-end prediction pipeline tests (CPU, starved config).

The synthetic closed loop is the reference's de-facto integration test
(SURVEY.md §4.1): render a known pose, predict it back.  On CPU we run a
deliberately small configuration (640x480/16 -> 40x30 px working images,
6x6x6 lookup); production accuracy targets apply to the TPU config
(160x90, HBM-sized lookup) exercised by bench.py.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="session")
def predict_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("predict_root")
    import json

    (root / "data").mkdir()
    with open(root / "data" / "paths.json", "w") as f:
        json.dump(
            {
                "URDFS": os.path.join(os.environ["ROPES3D_REPO"], "urdfs/"),
                "URDF": os.path.join(
                    os.environ["ROPES3D_REPO"],
                    "urdfs/motoman_mh5_support_limited/urdf/mh5l_limited.urdf",
                ),
            },
            f,
        )
    old_root = os.environ.get("ROPES3D_ROOT")
    os.environ["ROPES3D_ROOT"] = str(root)
    import ropes3d_tpu.simulation.crop_cache as cc

    old_budget = cc.CROP_SEC_ALLOTTED_APPROX
    cc.CROP_SEC_ALLOTTED_APPROX = 0.02
    from ropes3d_tpu.config import Paths

    Paths(str(root)).create()
    yield str(root)
    cc.CROP_SEC_ALLOTTED_APPROX = old_budget
    os.environ["ROPES3D_ROOT"] = old_root


CAM = [0, -1.5, 0.75, 0, 0, 0]


@pytest.fixture(scope="session")
def synth(predict_root):
    from ropes3d_tpu.simulation.lookup import RobotLookupManager

    lm = RobotLookupManager()
    ang, dep = lm.get(
        "640_480_color_16", CAM, 6, "SLU", divisions=np.array([6, 6, 6, 1, 1, 1])
    )
    assert ang.shape == (216, 6)
    from ropes3d_tpu.prediction.synthetic import SyntheticPredictor

    # lookup_topk=1 pins single-seed semantics: the fused-vs-stepwise parity
    # tests compare against the reference's single-seed stage loop, and the
    # smaller program keeps XLA:CPU compiles inside the suite budget.  The
    # staged top-k default is covered by test_fused_programs_trace (trace)
    # and test_multi_hypothesis_lookup (slow, numeric).
    return SyntheticPredictor(
        CAM, "640_480_color", 16, "SLU", noise=False, seed=0, lookup_topk=1
    )


def test_lookup_registry_roundtrip(predict_root, synth):
    import json

    from ropes3d_tpu.config import Paths
    from ropes3d_tpu.simulation.lookup import RobotLookupManager

    with open(Paths().ROBOT_LOOKUP_INFO) as f:
        info = json.load(f)
    assert len(info["lookups"]) == 1
    # Re-get must reuse, not re-create.
    lm = RobotLookupManager()
    ang, dep = lm.get("640_480_color_16", CAM, 6, "SLU", max_poses=10000)
    assert ang.shape[0] == 216


def test_lookup_invalidated_by_scene_tag(predict_root, synth, monkeypatch):
    """Tables rendered with a different mesh pipeline (e.g. after building
    the native QEM decimator) must not match — candidate geometry would
    diverge from the cached target renders (verify-skill gotcha, now keyed)."""
    import ropes3d_tpu.simulation.lookup as lk

    from ropes3d_tpu.config import Paths

    lookup_dir = Paths().ROBOT_LOOKUPS

    def count_tables():
        return len(
            [x for x in os.listdir(lookup_dir)
             if x.endswith(".h5") and "crop" not in x]
        )

    lm = lk.RobotLookupManager()
    n_before = count_tables()
    monkeypatch.setattr(lk, "default_scene_tag", lambda *a: "othertag0")
    ang2, _ = lm.get(
        "640_480_color_16", CAM, 6, "SLU",
        divisions=np.array([2, 2, 2, 1, 1, 1]),
    )
    n_after = count_tables()
    assert n_after == n_before + 1, "scene-tag mismatch must force re-creation"
    assert ang2.shape[0] == 8


def test_crop_cache(predict_root, synth):
    from ropes3d_tpu.camera import Intrinsics
    from ropes3d_tpu.simulation.crop_cache import Crop, applyCrop

    c = Crop(CAM, Intrinsics("640_480_color_16"))
    # Crops grow (weakly) with more links and stay inside the image.
    for n in range(1, 7):
        box = c[n]
        assert 0 <= box[0] < box[1] <= 29
        assert 0 <= box[2] < box[3] <= 39
    img = np.arange(30 * 40).reshape(30, 40)
    cropped = applyCrop(img, c[6])
    assert cropped.shape == c.shape(6)


def test_synthetic_closed_loop(synth):
    """Predict back known poses; starved config must still land within a few
    degrees on well-conditioned poses."""
    poses = np.array(
        [
            [0.72, -0.30, -0.74, 0, 0, 0],
            [1.23, -0.91, 1.55, 0, 0, 0],
            [0.66, -0.01, 2.43, 0, 0, 0],
        ]
    )
    errs = []
    for p in poses:
        actual, pred = synth.run(p)
        errs.append(np.degrees(np.abs(pred - actual))[:3])
    errs = np.array(errs)
    assert np.median(errs) < 2.0, f"median SLU error too high:\n{errs}"
    assert errs.min() < 1.0


@pytest.mark.slow
def test_batched_matches_sequential(synth):
    """Frame-parallel (vmapped) stages must reproduce per-frame results."""
    import jax.numpy as jnp

    poses = np.array(
        [[0.72, -0.30, -0.74, 0, 0, 0], [1.23, -0.91, 1.55, 0, 0, 0]],
        np.float32,
    )
    depth, lid = synth.renderer.render_batch_angles(poses)
    seq = np.stack(
        [synth.predictor.run_synthetic(depth[i], lid[i]) for i in range(2)]
    )
    bat = synth.predictor.run_batch_synthetic(depth, lid)
    np.testing.assert_allclose(bat, seq, atol=1e-4)


@pytest.mark.slow
def test_multi_hypothesis_lookup(synth):
    """lookup_topk refines k seeds in parallel and returns the best; must be
    at least as accurate as single-seed on a known pose."""
    pose = np.array([0.72, -0.30, -0.74, 0, 0, 0], np.float32)
    depth, lid = synth.renderer.render_batch_angles(pose[None])
    synth.predictor.lookup_topk = 2
    try:
        est = synth.predictor.run_synthetic(depth[0], lid[0])
    finally:
        synth.predictor.lookup_topk = 1
    err = np.degrees(np.abs(est - pose))[:3]
    assert np.median(err) < 2.5, err


@pytest.mark.slow
def test_topk_recovers_wrong_basin(synth):
    """Seeded wrong-basin fixture (VERDICT r2 item 5): on the starved CPU
    config, pose [0.865, -0.193, 1.887] converges >10 deg off single-seed;
    the staged top-k hypothesis search must land materially closer.  (This
    robustness is why topk=4 is the production default — a cheaper
    confidence-triggered escape was measured and cut, see
    assets/diag_escape_feats.py.)"""
    pose = np.array([0.865, -0.193, 1.887, 0, 0, 0], np.float32)
    depth, lid = synth.renderer.render_batch_angles(pose[None])
    p = synth.predictor
    e1 = e4 = None
    try:
        p.lookup_topk, p._synth_run_key = 1, None
        est1 = p.run_synthetic(depth[0], lid[0])
        e1 = np.degrees(np.abs(est1 - pose))[:3].max()

        p.lookup_topk, p._synth_run_key = 4, None
        est4 = p.run_synthetic(depth[0], lid[0])
        e4 = np.degrees(np.abs(est4 - pose))[:3].max()
    finally:
        p.lookup_topk, p._synth_run_key = 1, None
    assert e1 > 10.0, f"fixture no longer wrong-basin single-seed ({e1:.1f})"
    assert e4 < e1 - 5.0, f"staged top-k did not improve: {e1:.1f} -> {e4:.1f}"


def test_search_state_persistence(synth):
    """Search state (history/err_hist) must thread through stages."""
    from ropes3d_tpu.prediction.engine import SearchState

    s = SearchState.fresh()
    assert s.history.shape == (5, 6)
    assert float(s.lr[0]) == pytest.approx(0.1)


def test_predictor_full_angle_sets(synth):
    from ropes3d_tpu.prediction.stages import getStages, Descent, Polish

    for angs in ("SL", "SLU", "SLUB", "SLURB"):
        stages = getStages(angs)
        assert stages is not None and len(stages) > 1
    assert getStages("XYZ") is None
    full = getStages("SLURB")
    assert isinstance(full[-1], Polish)
    assert isinstance(full[-2], Descent)
    assert all(full[-1].joints[:5])


def test_fused_programs_trace(synth):
    """Trace-only sibling of the slow-marked tests: the topk=2 fused
    program and the frame-vmapped prep must trace to the right output
    shapes.  jax.eval_shape catches argument/shape regressions in seconds;
    the numeric equivalence itself is covered nightly by
    test_multi_hypothesis_lookup / test_batched_matches_sequential."""
    import jax
    import jax.numpy as jnp

    p = synth.predictor
    p._setStages()
    h = synth.renderer.intrinsics.height
    w = synth.renderer.intrinsics.width
    a = jax.ShapeDtypeStruct((h, w), jnp.float32)
    b = jax.ShapeDtypeStruct((h, w), jnp.int32)

    # topk=2 multi-hypothesis fused program (slow sibling compiles+runs it).
    prep = p._synth_prep_core()
    run2 = p._fused_run(prep, topk=2)
    out = jax.eval_shape(run2, a, b, p.lookup_depth, p.lookup_angles)
    assert out.shape == (6,)

    # topk=4 exercises the STAGED top-k split (4 > config.TOPK_FINAL: the
    # cheap stages rank all seeds, only the best TOPK_FINAL survivors run
    # the final descent + polish).
    from ropes3d_tpu.config import TOPK_FINAL

    assert TOPK_FINAL < 4
    run4 = p._fused_run(prep, topk=4)
    out = jax.eval_shape(run4, a, b, p.lookup_depth, p.lookup_angles)
    assert out.shape == (6,)

    # Robust fine re-rank: with robust_tau set + fine target + topk>1 the
    # fused program must pick the winner by re-ranking the final_m survivor
    # hypotheses at FINE_POLISH_SCALE x resolution (predictor._fused_run).
    if p.fine_scale:
        old_tau = p.robust_tau
        p.robust_tau = 0.1
        try:
            base_prep = p._synth_prep_core()
            fine_prep = p._synth_prep_fine_core()

            def prep3(x, y):
                bundle, crop = base_prep(x, y)
                return bundle, crop, fine_prep(x, y)

            runr = p._fused_run(prep3, topk=4, fine=True)
            out = jax.eval_shape(runr, a, b, p.lookup_depth, p.lookup_angles)
            # Re-rank lanes return (best, hypotheses[m,6], errors[m],
            # evidence[14]) — sorted best-first — so callers get the
            # evidence-based confidence + alternative basins.
            best, hyp, errs, evid = out
            assert best.shape == (6,)
            assert hyp.shape[1:] == (6,)
            assert errs.shape == (hyp.shape[0],)
            assert evid.shape == (14,)
        finally:
            p.robust_tau = old_tau

    # Frame-vmapped prep (run_batch_synthetic's target load).
    if not hasattr(p, "_synth_prep"):
        p._synth_prep = p._prepare_synthetic_device()
    F = 3
    af = jax.ShapeDtypeStruct((F, h, w), jnp.float32)
    bf = jax.ShapeDtypeStruct((F, h, w), jnp.int32)
    res = jax.eval_shape(jax.vmap(p._synth_prep), af, bf)
    bundle, crop = res[0], res[1]
    assert crop.shape[0] == F
    assert bundle.masks.shape[0] == F

    # Batched staged-top-k with return_k (the frame-parallel fine
    # re-rank path, predictor._run_stages rerank_batch): survivors come
    # back [F, m, 6] with working-res errors [F, m].
    from ropes3d_tpu.prediction.engine import _stage_key
    from ropes3d_tpu.config import TOPK_FINAL as _TF

    p._setStages()
    recipe_b = p.engine._recipe_fn(
        _stage_key(p.stages), 4, False, True, p.history_length,
        return_k=True,
    )
    w2c_s = jax.ShapeDtypeStruct((4, 4), jnp.float32)
    cam_s = jax.ShapeDtypeStruct((6,), jnp.float32)
    angs_s, errs_s = jax.eval_shape(
        recipe_b, w2c_s, cam_s, res[0], res[1],
        p.lookup_depth, p.lookup_angles,
    )
    assert angs_s.shape == (F, _TF, 6)
    assert errs_s.shape == (F, _TF)


@pytest.mark.slow
def test_fused_recipe_matches_stepwise(synth, monkeypatch):
    """The whole-recipe fused program (and its sharded-lookup split) must
    reproduce the per-stage dispatch loop exactly.

    Uses a trimmed recipe that exercises every stage type (Lookup, SFlip,
    Descent, InterpolativeSweep, TensorSweep, Polish) at ~1/5 the iteration
    counts of the canonical SLU recipe — parity is structural, not
    size-dependent, and the full-size recipe alone costs ~80 s of XLA:CPU
    runtime (suite budget, VERDICT r2 item 6).  The canonical recipe's
    fused-vs-stepwise parity runs in the slow lane
    (test_fused_recipe_matches_stepwise_full_slu)."""
    import ropes3d_tpu.prediction.predictor as pmod
    from ropes3d_tpu.prediction import stages as st

    trimmed = [
        st.Lookup(),
        st.SFlip(4),
        st.Descent(4, 2, "SL", [0.05, 0.05, 0.1, 0.5, 0.5, 0.5],
                   early_stop_thresh=0.1),
        st.InterpolativeSweep(6, 4, "U"),
        st.TensorSweep(6, 4, "S", 0.1),
        st.Descent(6, 2, "SLU", early_stop_thresh=0.0075),
        st.Polish(6, "SLU", radii=(0.003,)),
    ]
    monkeypatch.setattr(pmod, "getStages", lambda a: list(trimmed))
    pose = np.array([0.9, -0.5, 1.0, 0, 0, 0], np.float32)
    depth, lid = synth.renderer.render_batch_angles(pose[None])
    p = synth.predictor
    p._synth_run_key = None  # drop the program built for the canonical recipe
    try:
        pred_fused = p.run_synthetic(depth[0], lid[0])
        prep = p._prepare_synthetic_device()
        res = prep(depth[0], lid[0])
        p._target, p._tgt_lookup_crop = res[0], res[1]
        p._fine_target = res[2] if len(res) > 2 else None
        p._setStages()
        pred_step = p._apply_fine_polish_host(p._run_stages_stepwise())
    finally:
        # The program cache key doesn't include the recipe; force a rebuild
        # so later tests on this session-scoped predictor don't silently
        # reuse the trimmed program.
        p._synth_run_key = None
    np.testing.assert_allclose(pred_fused, pred_step, atol=1e-5)


@pytest.mark.slow
def test_fused_recipe_matches_stepwise_full_slu(synth):
    """Full canonical-SLU fused-vs-stepwise parity (~80 s XLA:CPU runtime;
    the default-lane sibling covers the same property on a trimmed recipe)."""
    pose = np.array([0.9, -0.5, 1.0, 0, 0, 0], np.float32)
    depth, lid = synth.renderer.render_batch_angles(pose[None])
    p = synth.predictor
    p._synth_run_key = None
    pred_fused = p.run_synthetic(depth[0], lid[0])
    prep = p._prepare_synthetic_device()
    res = prep(depth[0], lid[0])
    p._target, p._tgt_lookup_crop = res[0], res[1]
    p._fine_target = res[2] if len(res) > 2 else None
    p._setStages()
    pred_step = p._apply_fine_polish_host(p._run_stages_stepwise())
    np.testing.assert_allclose(pred_fused, pred_step, atol=1e-5)


def test_depth_gate_rejects_occluders_and_spill():
    """gate_depth zeroes in-mask pixels whose depth deviates from the mask's
    median beyond the half-window (occluder rectangles, mask-spill onto the
    background plane) and matches the host mirror bit-for-bit."""
    import jax.numpy as jnp

    from ropes3d_tpu.ops.image import gate_depth
    from ropes3d_tpu.prediction.predictor import Predictor

    rng = np.random.default_rng(0)
    h, w = 24, 32
    depth = np.full((h, w), 4.0, np.float32)      # background plane
    mask = np.zeros((h, w), bool)
    mask[4:20, 6:26] = True
    depth[4:20, 6:26] = rng.uniform(1.4, 1.7, (16, 20))  # robot link
    depth[10:14, 10:14] = 0.6                     # occluder inside the mask
    depth[4:20, 24:26] = 4.0                      # spill onto the plane
    depth[6, 7] = 0.0                             # sensor hole

    out = np.asarray(gate_depth(jnp.asarray(mask), jnp.asarray(depth), 0.45))
    assert (out[10:14, 10:14] == 0).all()         # occluder gated
    assert (out[4:20, 24:26] == 0).all()          # plane spill gated
    assert (out[5:9, 7:9] == depth[5:9, 7:9]).all()  # link depth kept
    assert out[6, 7] == 0.0                       # hole stays a hole

    host = Predictor._gate_np(mask, depth, 0.45)
    np.testing.assert_array_equal(out, host)

    # Empty mask: pass-through (no median to gate against).
    empty = np.zeros((h, w), bool)
    np.testing.assert_array_equal(
        np.asarray(gate_depth(jnp.asarray(empty), jnp.asarray(depth), 0.45)),
        depth,
    )
    np.testing.assert_array_equal(
        Predictor._gate_np(empty, depth, 0.45), depth
    )
