"""Kalman predictor tests: filter/smoother oracle check + behavioural checks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trajnetplusplusbaselines_tpu.data.rows import TrackRow
from trajnetplusplusbaselines_tpu.models.classical import kalman


def numpy_filter(q, r, mu0, sigma0, ys):
    """Straightforward textbook filter as the oracle (all steps observed)."""
    a = np.asarray(kalman.A_MAT)
    c = np.asarray(kalman.C_MAT)
    x, p = mu0, sigma0
    xs, ps = [], []
    for t, y in enumerate(ys):
        if t > 0:
            x = a @ x
            p = a @ p @ a.T + q
        s = c @ p @ c.T + r
        k = p @ c.T @ np.linalg.inv(s)
        x = x + k @ (y - c @ x)
        p = (np.eye(4) - k @ c) @ p
        xs.append(x.copy())
        ps.append(p.copy())
    return np.array(xs), np.array(ps)


def test_filter_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    ys = rng.normal(size=(9, 2)).cumsum(axis=0)
    mu0 = np.array([ys[0, 0], 0.0, ys[0, 1], 0.0])
    params = kalman.KFParams(
        1e-5 * jnp.eye(4), 0.05 ** 2 * jnp.eye(2), jnp.asarray(mu0), jnp.eye(4)
    )
    xf, pf, _, _ = kalman.kf_filter(params, jnp.asarray(ys), jnp.ones(9, bool))
    xs_np, ps_np = numpy_filter(1e-5 * np.eye(4), 0.05 ** 2 * np.eye(2), mu0, np.eye(4), ys)
    np.testing.assert_allclose(np.asarray(xf), xs_np, atol=1e-8)
    np.testing.assert_allclose(np.asarray(pf), ps_np, atol=1e-8)


def test_masked_filter_equals_short_filter():
    """Trailing-masked steps must not change the valid-prefix estimates."""
    rng = np.random.default_rng(1)
    ys = rng.normal(size=(9, 2)).cumsum(axis=0)
    mu0 = jnp.array([ys[0, 0], 0.0, ys[0, 1], 0.0])
    params = kalman.KFParams(1e-5 * jnp.eye(4), 0.0025 * jnp.eye(2), mu0, jnp.eye(4))

    mask = np.zeros(9, bool)
    mask[:5] = True
    padded = ys.copy()
    padded[5:] = 0.0
    xf_m, pf_m, xp_m, pp_m = kalman.kf_filter(params, jnp.asarray(padded), jnp.asarray(mask))
    xf_s, pf_s, xp_s, pp_s = kalman.kf_filter(
        params, jnp.asarray(ys[:5]), jnp.ones(5, bool)
    )
    np.testing.assert_allclose(np.asarray(xf_m)[:5], np.asarray(xf_s), atol=1e-10)

    # smoothed estimates on the valid prefix are unaffected by masked tail
    xs_m, _, _ = kalman.kf_smooth(params, xf_m, pf_m, xp_m, pp_m)
    xs_s, _, _ = kalman.kf_smooth(params, xf_s, pf_s, xp_s, pp_s)
    np.testing.assert_allclose(np.asarray(xs_m)[:5], np.asarray(xs_s), atol=1e-8)


def test_em_improves_observation_fit():
    rng = np.random.default_rng(2)
    t = np.arange(9)
    ys = np.stack([0.5 * t, -0.3 * t], axis=-1) + rng.normal(scale=0.01, size=(9, 2))
    mu0 = jnp.array([ys[0, 0], 0.0, ys[0, 1], 0.0])
    params = kalman.KFParams(1e-5 * jnp.eye(4), 0.0025 * jnp.eye(2), mu0, jnp.eye(4))
    mask = jnp.ones(9, bool)
    p = params
    for _ in range(10):
        p = kalman.kf_em_step(p, jnp.asarray(ys), mask)
    # learned observation noise shrinks toward the true 0.01 scale
    assert float(jnp.trace(p.r)) < float(jnp.trace(params.r))


def test_predict_linear_track_close_to_cv():
    frames = list(range(21))
    paths = [
        [TrackRow(f, 1, 0.5 * f, -0.2 * f) for f in frames],
        [TrackRow(f, 2, 1.0 + 0.1 * f, 0.3 * f) for f in frames],
    ]
    out = kalman.predict(paths, n_predict=12, obs_length=9)
    primary, neighs = out[0]
    assert primary.shape == (12, 2)
    assert neighs.shape == (12, 1, 2)
    # constant-velocity continuation of the primary
    expected = np.stack([0.5 * (9 + np.arange(12)), -0.2 * (9 + np.arange(12))], axis=-1)
    np.testing.assert_allclose(primary, expected, atol=0.35)


def test_predict_skips_unqualified_neighbours():
    frames = list(range(21))
    paths = [
        [TrackRow(f, 1, 0.5 * f, 0.0) for f in frames],
        [TrackRow(20, 2, 0.0, 0.0)],  # appears only after obs window
    ]
    out = kalman.predict(paths, n_predict=12, obs_length=9)
    _, neighs = out[0]
    assert len(neighs) == 0 or neighs.shape[1] == 0
