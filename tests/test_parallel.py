"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_compiles():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    rel, pred, valid = jax.jit(fn)(*args)
    assert rel.shape[-1] == 5
    assert np.isfinite(np.asarray(rel)).all()


def test_sharded_rollout_matches_single_device():
    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.parallel import make_mesh, make_sharded_rollout

    model = LSTM(pool=None)
    params = model.init_params(jax.random.PRNGKey(0))

    s, a = 16, 4
    rng = np.random.default_rng(0)
    xy = rng.normal(size=(9, s, a, 2)).cumsum(axis=0)
    mask = np.ones((9, s, a), bool)
    goals = np.zeros((s, a, 2))
    slot = np.ones((s, a), bool)

    # single-device reference
    rel_ref, pred_ref, valid_ref = model.forward(
        params, jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(goals),
        jnp.asarray(slot), n_predict=12,
    )

    mesh = make_mesh(8, tp=1)
    rollout, place_batch = make_sharded_rollout(model, mesh)
    with mesh:
        batch = place_batch(xy, mask, goals, slot)
        rel, pred, valid = rollout(params, *batch)

    np.testing.assert_allclose(np.asarray(rel), np.asarray(rel_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref), atol=1e-10)


def test_tensor_parallel_sharding_rule():
    from trajnetplusplusbaselines_tpu.parallel import make_mesh, shard_params
    from trajnetplusplusbaselines_tpu.models.lstm import LSTM

    model = LSTM(pool=None)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(8, tp=2)
    sharded = shard_params(mesh, params)

    w_ih = sharded["encoder"]["w_ih"]
    spec = w_ih.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "model")
    # values unchanged
    np.testing.assert_array_equal(np.asarray(w_ih), np.asarray(params["encoder"]["w_ih"]))
