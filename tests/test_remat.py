"""Remat mode (jax.checkpoint on the scan bodies) is value- and
gradient-neutral.

``model.remat = True`` recomputes each recurrence step's activations in the
backward pass instead of storing them across the 20-step rollout — the
standard TPU HBM/FLOPs trade (docs/SCALING.md).  It must not change any
number: same ops, same order, only different residual saving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.ops.pooling import AttentionMLPPooling, make_pool


def _scene(s=3, a=4, t=21, seed=0):
    rng = np.random.default_rng(seed)
    xy = jnp.asarray(np.cumsum(rng.normal(scale=0.3, size=(t, s, a, 2)), axis=0))
    mask = jnp.ones((t, s, a), bool)
    goals = jnp.zeros((s, a, 2))
    slot = jnp.ones((s, a), bool)
    return xy, mask, goals, slot


@pytest.mark.parametrize("pool_type", ["attentionmlp", "directional"])
def test_remat_forward_and_grad_identical(pool_type):
    pool = make_pool(
        pool_type,
        type("A", (), {"hidden_dim": 16, "pool_dim": 24, "spatial_dim": 8,
                       "vel_dim": 8, "attn_logit_cap": None, "cell_side": 0.6,
                       "n": 4, "front": False, "embedding_arch": "one_layer",
                       "pool_constant": 0, "norm": 0, "layer_dims": [32],
                       "latent_dim": 16})(),
    )
    model = LSTM(pool=pool, embedding_dim=8, hidden_dim=16)
    params = model.init_params(jax.random.PRNGKey(0))
    xy, mask, goals, slot = _scene()

    def loss(p):
        rel, _, valid = model.forward(
            p, xy[:9], mask[:9], goals, slot,
            prediction_truth=xy[9:20], prediction_truth_mask=mask[9:20],
        )
        return jnp.sum(jnp.where(valid[..., None], rel, 0.0) ** 2)

    model.remat = False
    v0, g0 = jax.value_and_grad(loss)(params)
    model.remat = True
    v1, g1 = jax.value_and_grad(loss)(params)

    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    for l0, l1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(l0), np.asarray(l1), rtol=0, atol=1e-12
        )


def test_old_pickles_without_remat_attr():
    model = LSTM(pool=AttentionMLPPooling(hidden_dim=16, mlp_dim=32,
                                          mlp_dim_spatial=8, mlp_dim_vel=8,
                                          out_dim=24), embedding_dim=8,
                 hidden_dim=16)
    params = model.init_params(jax.random.PRNGKey(0))
    xy, mask, goals, slot = _scene()
    want = model.forward(params, xy[:9], mask[:9], goals, slot, n_predict=3)
    del model.remat
    got = model.forward(params, xy[:9], mask[:9], goals, slot, n_predict=3)
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))
