"""Batched observation-phase pooling == per-step pooling, bit-for-bit.

encode() pools position-only grids (directional/occupancy) for the whole
observation phase in one dispatch; this pins that path to the per-step
reference path at float64.
"""

import numpy as np
import pytest


def _batch(t=9, s=4, a=6, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xy = rng.normal(size=(t, s, a, 2)).cumsum(axis=0) * 0.4
    mask = rng.random((t, s, a)) > 0.15
    mask[:, :, 0] = True  # primary always present
    xy = np.where(mask[..., None], xy, 0.0)
    goals = np.zeros((s, a, 2))
    slot = np.ones((s, a), bool)
    slot[:, -1] = False  # one dead slot
    return (jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(goals),
            jnp.asarray(slot))


def _make_pool(type_):
    from trajnetplusplusbaselines_tpu.ops.pooling import (
        GridBasedPooling, NearestNeighborMLP,
    )

    if type_ == "nn":
        return NearestNeighborMLP(n=4, out_dim=32)
    return GridBasedPooling(type_=type_, hidden_dim=32, cell_side=0.6, n=8,
                            out_dim=32)


@pytest.mark.parametrize("type_", ["directional", "occupancy", "nn"])
def test_batched_obs_pooling_bitexact(type_):
    import jax

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM

    pool = _make_pool(type_)
    assert pool.position_only
    model = LSTM(pool=pool, embedding_dim=16, hidden_dim=32)
    params = model.init_params(jax.random.PRNGKey(0))
    xy, mask, goals, slot = _batch()

    carry = model.init_carry(xy.shape[1], xy.shape[2])
    fast = model.encode(params, carry, xy, mask, goals, slot)

    # force the per-step path by hiding the position_only flag
    orig = type(pool).position_only
    try:
        type(pool).position_only = property(lambda self: False)
        slow = model.encode(params, carry, xy, mask, goals, slot)
    finally:
        type(pool).position_only = orig

    for f, s_ in zip(jax.tree.leaves(fast), jax.tree.leaves(slow)):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(s_))


def test_stateful_and_hidden_pools_keep_per_step_path():
    """social/dir_social and lstm_layer grids must NOT take the batched
    path (they read the hidden state / carry pool state)."""
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    assert not GridBasedPooling(type_="social", hidden_dim=32).position_only
    assert not GridBasedPooling(type_="dir_social", hidden_dim=32).position_only
    assert not GridBasedPooling(
        type_="directional", hidden_dim=32, embedding_arch="lstm_layer"
    ).position_only
