"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


def test_sharded_lookup_matches_unsharded():
    from ropes3d_tpu.parallel.mesh import shard_lookup_stack
    from ropes3d_tpu.prediction.engine import CandidateEvaluator

    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.random((37, 16, 24)), jnp.float32)  # non-multiple of 8
    angles = jnp.asarray(rng.random((37, 6)), jnp.float32)
    tgt = jnp.asarray(rng.random((16, 24)), jnp.float32)

    ref = np.asarray(CandidateEvaluator.lookup_select(tgt, stack, angles))
    s_stack, s_angles, mesh = shard_lookup_stack(stack, angles)
    assert mesh is not None
    assert s_stack.shape[0] % 8 == 0
    out = np.asarray(CandidateEvaluator.lookup_select(tgt, s_stack, s_angles))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_dp_mesh_helpers():
    from ropes3d_tpu.parallel.mesh import get_mesh, shard_batch, replicated

    mesh = get_mesh(8, ("data",))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None)
    r = replicated(jnp.ones(3), mesh)
    assert r.sharding.spec == jax.sharding.PartitionSpec()


def test_memory_budget():
    from ropes3d_tpu.parallel.memory import (
        device_memory_bytes,
        lookup_budget_elements,
    )

    b = device_memory_bytes()
    assert b > 1 << 28
    assert lookup_budget_elements(32, fraction=0.1, n_devices=2) == int(
        b * 8 * 0.1 * 2
    )
