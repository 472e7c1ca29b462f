"""Fused Pallas D-LSTM step vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling


def _setup(seed=0, s=4, a=8):
    pool = GridBasedPooling(type_="directional", hidden_dim=128, cell_side=0.6,
                            n=12, out_dim=256)
    model = LSTM(pool=pool)
    params = model.init_params(jax.random.PRNGKey(seed))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    rng = np.random.default_rng(seed)
    obs1 = rng.normal(size=(s, a, 2)).astype(np.float32)
    obs2 = obs1 + rng.normal(scale=0.3, size=(s, a, 2)).astype(np.float32)
    p1 = rng.random((s, a)) > 0.2
    p2 = rng.random((s, a)) > 0.2
    p1[:, 0] = p2[:, 0] = True  # primary always present
    obs1 = np.where(p1[..., None], obs1, 0.0)
    obs2 = np.where(p2[..., None], obs2, 0.0)
    h = rng.normal(scale=0.5, size=(s, a, 128)).astype(np.float32)
    c = rng.normal(scale=0.5, size=(s, a, 128)).astype(np.float32)
    return model, params, obs1, obs2, p1, p2, h, c


@pytest.mark.parametrize("a", [4, 8, 16])
def test_fused_step_matches_xla_step(a):
    from jax.experimental.pallas import tpu as pltpu

    from trajnetplusplusbaselines_tpu.ops.pallas import fused_step

    model, params, obs1, obs2, p1, p2, h, c = _setup(s=4 if a <= 8 else 2, a=a)
    s, a = obs1.shape[:2]

    # XLA reference path (decoder cell)
    carry = model.init_carry(s, a)
    carry = carry._replace(h=jnp.asarray(h), c=jnp.asarray(c))
    goals = jnp.zeros((s, a, 2), jnp.float32)
    slot = jnp.ones((s, a), bool)
    new_carry, normal_ref, mask_ref = model.step(
        params, "decoder", carry,
        jnp.asarray(obs1), jnp.asarray(obs2),
        jnp.asarray(p1), jnp.asarray(p2), goals, slot,
    )

    weights = fused_step.weights_from_params(params)
    am = lambda x: jnp.moveaxis(jnp.asarray(x), 0, 0).swapaxes(0, 1)  # [S,A,..]->[A,S,..]
    with pltpu.force_tpu_interpret_mode():
        h_new, c_new, normal, mask = fused_step.fused_dlstm_step(
            am(obs1), am(obs2),
            am(p1.astype(np.float32)), am(p2.astype(np.float32)),
            am(h), am(c), weights,
            a=a, scene_block=s,
        )

    back = lambda x: np.asarray(jnp.swapaxes(x, 0, 1))  # [A,S,..]->[S,A,..]
    assert (back(mask) > 0).tolist() == np.asarray(mask_ref).tolist()
    np.testing.assert_allclose(back(h_new), np.asarray(new_carry.h),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(back(c_new), np.asarray(new_carry.c),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(back(normal), np.asarray(normal_ref),
                               atol=1e-5, rtol=1e-5)
