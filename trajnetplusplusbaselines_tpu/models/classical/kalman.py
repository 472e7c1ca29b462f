"""Kalman-filter predictor: batched constant-velocity KF with EM, in JAX.

Behavioural mirror of /root/reference/trajnetbaselines/classical/kalman.py:6-73,
which wraps pykalman per pedestrian: EM-fit Q/R/initial state on the observed
past, RTS-smooth, then average 5 sampled futures.  Here every pedestrian of a
scene runs in parallel under vmap, with filter / smoother / sampler written
as ``lax.scan`` recurrences and EM as a ``fori_loop`` — one jit-compiled
call per (obs_length, agents) bucket instead of a Python loop per track.

State [x, vx, y, vy]; transition and observation models fixed; EM learns
(transition_covariance, observation_covariance, initial_state_mean,
initial_state_covariance), pykalman's default em_vars, for n_iter=10.
Sampling parity is statistical (different RNG streams).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...data.reader import Reader

A_MAT = jnp.array(
    [[1.0, 1.0, 0.0, 0.0],
     [0.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, 1.0, 1.0],
     [0.0, 0.0, 0.0, 1.0]]
)
C_MAT = jnp.array([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])


class KFParams(NamedTuple):
    q: jnp.ndarray  # [4, 4] transition covariance
    r: jnp.ndarray  # [2, 2] observation covariance
    mu0: jnp.ndarray  # [4]
    sigma0: jnp.ndarray  # [4, 4]


def _symmetrize(m):
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))


def kf_filter(params: KFParams, ys: jnp.ndarray, mask: jnp.ndarray):
    """Masked Kalman filter over [T, 2] observations.

    Returns filtered means/covs, one-step predicted means/covs and gains.
    """

    def step(carry, inputs):
        x_prev, p_prev, first = carry
        y, m = inputs
        x_pred = jnp.where(first, params.mu0, A_MAT @ x_prev)
        p_pred = jnp.where(
            first, params.sigma0, _symmetrize(A_MAT @ p_prev @ A_MAT.T + params.q)
        )

        s = C_MAT @ p_pred @ C_MAT.T + params.r
        k = p_pred @ C_MAT.T @ jnp.linalg.inv(s)
        innov = y - C_MAT @ x_pred
        x_upd = x_pred + k @ innov
        p_upd = _symmetrize((jnp.eye(4) - k @ C_MAT) @ p_pred)

        x = jnp.where(m, x_upd, x_pred)
        p = jnp.where(m, p_upd, p_pred)
        return (x, p, jnp.zeros((), bool)), (x, p, x_pred, p_pred)

    init = (jnp.zeros(4), jnp.eye(4), jnp.ones((), bool))
    _, (xf, pf, xp, pp) = jax.lax.scan(step, init, (ys, mask))
    return xf, pf, xp, pp


def kf_smooth(params: KFParams, xf, pf, xp, pp):
    """RTS smoother. Returns smoothed means/covs and smoother gains J."""
    t = xf.shape[0]

    def step(carry, inputs):
        x_next_s, p_next_s = carry
        x_f, p_f, x_pred_next, p_pred_next = inputs
        j = p_f @ A_MAT.T @ jnp.linalg.inv(p_pred_next)
        x_s = x_f + j @ (x_next_s - x_pred_next)
        p_s = _symmetrize(p_f + j @ (p_next_s - p_pred_next) @ j.T)
        return (x_s, p_s), (x_s, p_s, j)

    inputs = (xf[:-1], pf[:-1], xp[1:], pp[1:])
    (_, _), (xs_rev, ps_rev, js_rev) = jax.lax.scan(
        step, (xf[-1], pf[-1]), inputs, reverse=True
    )
    xs = jnp.concatenate([xs_rev, xf[-1:]], axis=0)
    ps = jnp.concatenate([ps_rev, pf[-1:]], axis=0)
    return xs, ps, js_rev  # js_rev[t] pairs step t with t+1


def kf_em_step(params: KFParams, ys, mask):
    """One EM update of (Q, R, mu0, Sigma0) with trailing-masked sequences."""
    xf, pf, xp, pp = kf_filter(params, ys, mask)
    xs, ps, js = kf_smooth(params, xf, pf, xp, pp)

    # cross covariance Cov(x_t, x_{t+1} | data) = J_t P^s_{t+1}
    cross = js @ ps[1:]  # [T-1, 4, 4] == P^s_{t, t+1}

    # transitions fully inside the valid prefix
    trans_mask = (mask[:-1] & mask[1:]).astype(ys.dtype)  # [T-1]
    n_trans = jnp.maximum(jnp.sum(trans_mask), 1.0)

    x0, x1 = xs[:-1], xs[1:]
    s00 = ps[:-1] + x0[..., :, None] * x0[..., None, :]
    s11 = ps[1:] + x1[..., :, None] * x1[..., None, :]
    s10 = jnp.swapaxes(cross, -1, -2) + x1[..., :, None] * x0[..., None, :]

    q_terms = s11 - s10 @ A_MAT.T - A_MAT @ jnp.swapaxes(s10, -1, -2) + A_MAT @ s00 @ A_MAT.T
    q_new = jnp.sum(q_terms * trans_mask[:, None, None], axis=0) / n_trans

    obs_mask = mask.astype(ys.dtype)
    n_obs = jnp.maximum(jnp.sum(obs_mask), 1.0)
    resid = ys - (C_MAT @ xs[..., None])[..., 0]
    r_terms = resid[..., :, None] * resid[..., None, :] + C_MAT @ ps @ C_MAT.T
    r_new = jnp.sum(r_terms * obs_mask[:, None, None], axis=0) / n_obs

    mu0_new = xs[0]
    sigma0_new = _symmetrize(ps[0])
    # floors keep the filter/smoother inversions well-conditioned even when a
    # perfectly linear track drives the EM covariances toward zero (pykalman
    # survives via pinv; explicit regularization is the jit-friendly form)
    eye4, eye2 = jnp.eye(4), jnp.eye(2)
    return KFParams(
        _symmetrize(q_new) + 1e-6 * eye4,
        _symmetrize(r_new) + 1e-6 * eye2,
        mu0_new,
        sigma0_new + 1e-6 * eye4,
    )


def kf_fit_and_predict(ys, mask, key, n_predict: int, n_iter: int = 10, n_samples: int = 5):
    """EM-fit one track, smooth, and average sampled futures.

    ys [T, 2] (valid prefix per mask), key: PRNG. Returns [n_predict, 2].
    """
    first = ys[0]
    mu0 = jnp.array([first[0], 0.0, first[1], 0.0])
    params = KFParams(1e-5 * jnp.eye(4), 0.05 ** 2 * jnp.eye(2), mu0, jnp.eye(4))

    def em_body(_, p):
        return kf_em_step(p, ys, mask)

    params = jax.lax.fori_loop(0, n_iter, em_body, params)

    xf, pf, xp, pp = kf_filter(params, ys, mask)
    xs, _, _ = kf_smooth(params, xf, pf, xp, pp)
    last_idx = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - 1, 0)
    x_last = xs[last_idx]

    # PSD factors for sampling: EM covariances of very short tracks can be
    # numerically indefinite (off-diagonals dominating the floors), where a
    # Cholesky would NaN; an eigh factor with clipped eigenvalues is robust
    def psd_factor(m):
        w, v = jnp.linalg.eigh(m)
        return v * jnp.sqrt(jnp.clip(w, 0.0, None))[None, :]

    q_chol = psd_factor(params.q)
    r_chol = psd_factor(params.r)

    def sample_one(k):
        ks = jax.random.split(k, n_predict)

        def step(x, kk):
            k1, k2 = jax.random.split(kk)
            x_next = A_MAT @ x + q_chol @ jax.random.normal(k1, (4,))
            y = C_MAT @ x_next + r_chol @ jax.random.normal(k2, (2,))
            return x_next, y

        _, samples = jax.lax.scan(step, x_last, ks)
        return samples  # [n_predict, 2]

    keys = jax.random.split(key, n_samples)
    all_samples = jax.vmap(sample_one)(keys)
    return jnp.mean(all_samples, axis=0)


@functools.partial(jax.jit, static_argnames=("n_predict",))
def kf_predict_batch(ys, mask, keys, n_predict: int = 12):
    """vmap kf_fit_and_predict over the agent axis. ys [A, T, 2]."""
    return jax.vmap(lambda y, m, k: kf_fit_and_predict(y, m, k, n_predict))(ys, mask, keys)


def predict(paths, predict_all: bool = True, n_predict: int = 12, obs_length: int = 9,
            seed: int = 0):
    """Path-level API mirroring the reference's kalman.predict."""
    primary = paths[0]
    start_frame = primary[obs_length - 1].frame

    # compact each qualifying agent's past observations (reference squashes
    # frame gaps: pykalman sees consecutive steps)
    kept_index = []
    seqs, masks = [], []
    max_len = obs_length
    for i, path in enumerate(paths):
        past = [(r.x, r.y) for r in path if r.frame <= start_frame]
        past_frames = [r.frame for r in path if r.frame <= start_frame]
        if start_frame not in past_frames or len(past) < 2:
            continue
        kept_index.append(i)
        seq = np.zeros((max_len, 2))
        seq[: len(past)] = past[:max_len]
        m = np.zeros(max_len, bool)
        m[: min(len(past), max_len)] = True
        seqs.append(seq)
        masks.append(m)

    if not kept_index or kept_index[0] != 0:
        raise ValueError("primary pedestrian has insufficient past for KF")

    # pad the agent axis to a bucket so jit compiles once per bucket size
    from ...data.batching import agent_bucket

    n_real = len(seqs)
    n_pad = agent_bucket(n_real)
    for _ in range(n_pad - n_real):
        seqs.append(np.zeros((max_len, 2)))
        masks.append(np.zeros(max_len, bool))

    # classical baselines are tiny host-side models: pin them to the CPU
    # backend so per-scene calls never round-trip the TPU tunnel
    with jax.default_device(jax.devices("cpu")[0]):
        ys = jnp.asarray(np.stack(seqs))
        mask = jnp.asarray(np.stack(masks))
        keys = jax.random.split(jax.random.PRNGKey(seed), n_pad)
        preds = np.asarray(kf_predict_batch(ys, mask, keys, n_predict=n_predict))[:n_real]

    primary_track = preds[0]
    neighbours_tracks = preds[1:]
    if len(neighbours_tracks):
        neighbours_tracks = neighbours_tracks.transpose(1, 0, 2)
    if not predict_all:
        neighbours_tracks = []
    return {0: (primary_track, neighbours_tracks)}
