"""Golden-value unit tests mirroring the reference suite's intent
(/root/reference/tests/test_pooling.py, test_lstm_loss.py, test_lstm_modules.py,
whose stale APIs are documented in SURVEY.md section 4): known grid contents,
closed-form loss values, NaN semantics, tag vectors.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trajnetplusplusbaselines_tpu.losses import (
    collision_loss,
    gaussian_2d,
    l2_loss,
    prediction_loss,
)
from trajnetplusplusbaselines_tpu.ops.embeddings import start_dec, start_enc
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling
from trajnetplusplusbaselines_tpu.ops.pooling.nongrid import rel_obs


def make_grid(pool, obs2, present2=None, obs1=None, present1=None, hidden_dim=128):
    """Helper: single-scene grid from [A, 2] positions."""
    a = obs2.shape[0]
    obs2 = jnp.asarray(obs2)[None]
    obs1 = jnp.asarray(obs1)[None] if obs1 is not None else obs2
    p2 = (
        jnp.asarray(present2)[None]
        if present2 is not None
        else jnp.ones((1, a), bool)
    )
    p1 = jnp.asarray(present1)[None] if present1 is not None else p2
    hidden = jnp.zeros((1, a, hidden_dim))
    params = pool.init_params(jax.random.PRNGKey(0))
    return np.asarray(
        pool.make_grid(hidden, obs1, obs2, p1, p2, params)
    )[0]  # [A, D, n, n]


def test_simple_occupancy_grid():
    # two agents 2m apart on the diagonal; n=2, cell 2m: each occupies the
    # opposite corner of the other's grid (reference test_simple_grid intent)
    pool = GridBasedPooling(type_="occupancy", n=2, cell_side=2.0)
    obs = np.array([[0.0, 0.0], [-1.0, -1.0]])
    grid = make_grid(pool, obs)
    assert grid.shape == (2, 1, 2, 2)
    assert grid[0, 0].tolist() == [[1.0, 0.0], [0.0, 0.0]]
    assert grid[1, 0].tolist() == [[0.0, 0.0], [0.0, 1.0]]


def test_directional_grid_values():
    # neighbour below-left moving with relative velocity (-0.2, -0.2)
    pool = GridBasedPooling(type_="directional", n=2, cell_side=2.0)
    obs1 = np.array([[0.0, 0.0], [-1.0, -1.0]])
    obs2 = np.array([[0.1, 0.1], [-1.1, -1.1]])
    grid = make_grid(pool, obs2, obs1=obs1)
    # agent 0 sees the neighbour in its lower-left cell with rel vel -0.2
    assert grid[0, 0, 0, 0] == pytest.approx(-0.2, abs=1e-6)
    assert grid[0, 1, 0, 0] == pytest.approx(-0.2, abs=1e-6)
    # agent 1 sees the opposite
    assert grid[1, 0, 1, 1] == pytest.approx(0.2, abs=1e-6)


def test_absent_neighbour_gives_constant_grid():
    # reference test_nan intent: unobserved neighbour -> empty grid
    pool = GridBasedPooling(type_="occupancy", n=2, cell_side=2.0)
    obs = np.array([[0.0, 0.0], [5.0, 5.0]])
    grid = make_grid(pool, obs, present2=np.array([True, False]))
    assert grid[0].sum() == 0.0


def test_front_grid_offset():
    # front=True shifts the y-origin: a neighbour behind is invisible,
    # one ahead lands in the grid
    pool = GridBasedPooling(type_="occupancy", n=2, cell_side=2.0, front=True)
    ahead = make_grid(pool, np.array([[0.0, 0.0], [0.5, 1.0]]))
    behind = make_grid(pool, np.array([[0.0, 0.0], [0.5, -1.0]]))
    assert ahead[0].sum() == 1.0
    assert behind[0].sum() == 0.0


def test_last_write_wins_collision():
    # two neighbours mapping to the same cell: the higher index wins
    pool = GridBasedPooling(type_="directional", n=2, cell_side=2.0)
    obs1 = np.array([[0.0, 0.0], [-1.0, -1.0], [-1.2, -1.2]])
    obs2 = np.array([[0.0, 0.0], [-1.0, -1.0], [-1.0, -1.0]])  # same cell
    grid = make_grid(pool, obs2, obs1=obs1)
    # neighbour 2's velocity (0.2, 0.2) overwrites neighbour 1's (0, 0)
    assert grid[0, 0, 0, 0] == pytest.approx(0.2, abs=1e-6)


def test_rel_obs_values():
    positions = jnp.asarray([[[0.0, 0.0], [1.0, 1.0]]])
    rel = np.asarray(rel_obs(positions))[0]
    assert rel[0].tolist() == [[0.0, 0.0], [1.0, 1.0]]
    assert rel[1].tolist() == [[-1.0, -1.0], [0.0, 0.0]]


def test_start_tags():
    vel = jnp.zeros((2, 2))
    assert np.asarray(start_enc(vel, 4)).tolist() == [[0, 0, 1, 0], [0, 0, 1, 0]]
    assert np.asarray(start_dec(vel, 4)).tolist() == [[0, 0, 0, 1], [0, 0, 0, 1]]


def test_prediction_loss_closed_form():
    # reference test_simple: unit Gaussian at the target
    inputs = jnp.asarray([[[0.0, 0.0, 1.0, 1.0, 0.0]], [[0.0, 0.0, 1.0, 1.0, 0.0]]])
    targets = jnp.zeros((2, 1, 2))
    loss = prediction_loss(inputs, targets, background_rate=0.0, keep_batch_dim=True)
    gauss_denom = 1.0 / math.sqrt(2.0 * math.pi) ** 2
    expected = -math.log(0.01 + 0.99 * gauss_denom)
    assert float(loss[0]) == pytest.approx(expected, rel=1e-4)


def test_prediction_loss_narrower_progression():
    # reference test_narrower_progression: tighter sigma -> lower loss at mean
    losses = []
    for sigma in (1.0, 0.5, 0.1):
        inputs = jnp.asarray([[[0.0, 0.0, sigma, sigma, 0.0]]])
        targets = jnp.zeros((1, 1, 2))
        losses.append(float(prediction_loss(inputs, targets, background_rate=0.0)))
    assert losses[0] > losses[1] > losses[2]


def test_gaussian_2d_integrates_to_density():
    p = jnp.asarray([0.3, -0.2, 0.5, 0.8, 0.4])
    x = jnp.asarray([0.3, -0.2])
    # at the mean: 1 / (2 pi s1 s2 sqrt(1 - rho^2))
    expected = 1.0 / (2 * math.pi * 0.5 * 0.8 * math.sqrt(1 - 0.16))
    assert float(gaussian_2d(p, x)) == pytest.approx(expected, rel=1e-6)


def test_collision_loss_arithmetic():
    # reference test_col_loss intent: hinge sums over colliding neighbours
    positions = np.array(
        [
            [[0, 0], [1, 0], [2, 0], [3, 0]],
            [[0, 4], [1, 3], [2, 2], [3, 1]],
            [[0, -3], [1, -2], [2, -1], [3, -1]],
            [[0, -8], [1, -8], [2, -8], [3, -8]],
        ],
        dtype=float,
    ).transpose(1, 0, 2)[:, None]  # [T=4, S=1, A=4, 2]
    mask = jnp.ones((4, 1, 4), bool)

    loss = collision_loss(jnp.asarray(positions), mask, col_wt=2.0, col_distance=2.0)
    assert float(loss) == pytest.approx(3.0)
    loss = collision_loss(jnp.asarray(positions), mask, col_wt=4.0, col_distance=2.0)
    assert float(loss) == pytest.approx(6.0)
    loss = collision_loss(jnp.asarray(positions), mask, col_wt=2.0, col_distance=4.0)
    assert float(loss) == pytest.approx(7.5)


def test_l2_loss_multiplier():
    inputs = jnp.zeros((1, 1, 5))
    targets = jnp.ones((1, 1, 2))
    assert float(l2_loss(inputs, targets)) == pytest.approx(100.0)


def test_dir_social_grid_intent():
    """dir_social concatenates [rel_velocity(2) ++ encoded_hidden(latent)] per
    cell — the documented intent; the reference implementation crashes for
    latent_dim != 2 (cat on the neighbour axis, gridbased_pooling.py:209), so
    this is covered by an intent test instead of the oracle."""
    import jax

    pool = GridBasedPooling(type_="dir_social", n=2, cell_side=2.0, latent_dim=4,
                            hidden_dim=8)
    params = pool.init_params(jax.random.PRNGKey(0))
    obs1 = jnp.asarray([[[0.0, 0.0], [-1.0, -1.0]]])
    obs2 = jnp.asarray([[[0.1, 0.1], [-1.1, -1.1]]])
    hidden = jnp.ones((1, 2, 8))
    p = jnp.ones((1, 2), bool)
    grid = np.asarray(pool.make_grid(hidden, obs1, obs2, p, p, params))[0]
    assert grid.shape == (2, 6, 2, 2)  # D = 2 (rel vel) + 4 (latent)
    # velocity channels carry the relative velocity
    assert grid[0, 0, 0, 0] == pytest.approx(-0.2, abs=1e-6)
    # hidden channels carry the encoded neighbour hidden state
    from trajnetplusplusbaselines_tpu.ops.core import linear

    expected = np.asarray(linear(params["hidden_dim_encoding"], jnp.ones(8)))
    np.testing.assert_allclose(grid[0, 2:, 0, 0], expected, atol=1e-6)
