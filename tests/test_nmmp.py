"""NMMP message-passing golden tests (hand-computed 3-agent case).

The reference module (/root/reference/trajnetbaselines/lstm/more_non_gridbased_pooling.py:5-79)
cannot be executed as an oracle: its ``message_pass`` assumes per-scene 2-D
input but the pooling interface feeds padded 3-D tensors with NaN rows, so
these tests pin the repaired dense formulation against hand-computed values
of the NMMP algorithm itself.
"""

import numpy as np
import jax
import jax.numpy as jnp

from trajnetplusplusbaselines_tpu.ops.pooling.nongrid import NMMP


def _hand_params(m=2):
    """Weights chosen so one message-pass round is hand-computable:

    hidden_embedding = identity; node_to_edge([x; y]) = x + 2y;
    edge_to_node([e_in; e_out]) = e_in + e_out; out = identity.
    => node'[i] = 3*n_i + 3*mean_{j != i} n_j
    """
    eye = np.eye(m)
    return {
        "hidden_embedding": {"w": jnp.asarray(eye), "b": jnp.zeros(m)},
        "node_to_edge": {"w": jnp.asarray(np.vstack([eye, 2 * eye])), "b": jnp.zeros(m)},
        "edge_to_node": {"w": jnp.asarray(np.vstack([eye, eye])), "b": jnp.zeros(m)},
        "out": {"w": jnp.asarray(eye), "b": jnp.zeros(m)},
    }


def _apply(pool, params, hidden, present):
    s, a = hidden.shape[:2]
    obs = jnp.zeros((s, a, 2))
    out, _ = pool.apply(
        params, None, jnp.asarray(hidden), obs, obs,
        jnp.asarray(present), jnp.asarray(present), jnp.asarray(present),
    )
    return np.asarray(out)


def test_nmmp_one_round_three_agents():
    pool = NMMP(hidden_dim=2, mlp_dim=2, k=1, out_dim=2)
    params = _hand_params()
    hidden = np.array([[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]])  # n0, n1, n2
    present = np.ones((1, 3), bool)
    out = _apply(pool, params, hidden, present)
    # node'[i] = 3 n_i + 3 mean_{j != i} n_j
    expected = np.array([[[4.5, 3.0], [3.0, 4.5], [4.5, 4.5]]])
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_nmmp_absent_agent_excluded_from_means():
    pool = NMMP(hidden_dim=2, mlp_dim=2, k=1, out_dim=2)
    params = _hand_params()
    hidden = np.array([[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]])
    present = np.array([[True, True, False]])  # agent 2 not in this step
    out = _apply(pool, params, hidden, present)
    # pairs only between agents 0 and 1: node'[0] = 3 n0 + 3 n1 = (3, 3)
    np.testing.assert_allclose(out[0, 0], [3.0, 3.0], atol=1e-12)
    np.testing.assert_allclose(out[0, 1], [3.0, 3.0], atol=1e-12)


def test_nmmp_single_track_returns_zeros():
    """Mirrors the reference's num_tracks == 1 early exit (zeros, not bias)."""
    pool = NMMP(hidden_dim=2, mlp_dim=2, k=3, out_dim=2)
    params = _hand_params()
    params["out"]["b"] = jnp.ones(2)  # bias must not leak through
    hidden = np.array([[[1.0, 2.0], [5.0, 6.0]]])
    present = np.array([[True, False]])
    out = _apply(pool, params, hidden, present)
    np.testing.assert_array_equal(out[0, 0], [0.0, 0.0])


def test_nmmp_two_rounds_compose():
    pool1 = NMMP(hidden_dim=2, mlp_dim=2, k=1, out_dim=2)
    pool2 = NMMP(hidden_dim=2, mlp_dim=2, k=2, out_dim=2)
    params = _hand_params()
    hidden = np.array([[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]])
    present = np.ones((1, 3), bool)
    once = _apply(pool1, params, hidden, present)[0]
    # second round on the round-1 nodes (k=1 output with identity out-proj)
    n = once
    expected = np.stack([3 * n[i] + 3 * np.mean(np.delete(n, i, 0), 0) for i in range(3)])
    twice = _apply(pool2, params, hidden, present)[0]
    np.testing.assert_allclose(twice, expected, atol=1e-10)


def test_nmmp_registry_and_model_forward():
    """--type nmmp wires through make_pool and the LSTM forward."""
    import argparse

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import make_pool

    args = argparse.Namespace(
        hidden_dim=32, pool_dim=32, mp_iters=2, cell_side=0.6, n=4,
        layer_dims=[32], embedding_arch="one_layer", pool_constant=0,
        norm_pool=False, front=False, latent_dim=8, norm=0, no_vel=False,
        spatial_dim=8, vel_dim=8, neigh=2,
    )
    pool = make_pool("nmmp", args)
    model = LSTM(pool=pool, embedding_dim=16, hidden_dim=32)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xy = rng.normal(size=(9, 2, 3, 2)).cumsum(axis=0)
    mask = np.ones((9, 2, 3), bool)
    rel, pred, valid = model.forward(
        params, jnp.asarray(xy), jnp.asarray(mask),
        jnp.zeros((2, 3, 2)), jnp.ones((2, 3), bool), n_predict=12,
    )
    assert rel.shape == (9 - 2 + 12, 2, 3, 5)  # 7 encoder outputs + 12 decoder
    assert np.isfinite(np.asarray(rel)).all()
