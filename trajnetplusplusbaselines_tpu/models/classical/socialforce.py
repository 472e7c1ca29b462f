"""Social-force predictor (Helbing & Molnar 1995), vectorized in JAX.

Behavioural mirror of /root/reference/trajnetbaselines/classical/socialforce.py:10-111,
which wraps the external vita-epfl ``socialforce`` torch package: 20 fps
simulation with a ped-ped interaction potential V(b) = v0 exp(-b / sigma)
(b the ellipse semi-minor axis), field-of-view weighting (200 degrees, 0.5
out-of-view factor), relaxation to the desired velocity with time constant
tau, 1.3x speed cap, subsampled back to 2.5 fps.

The whole simulation is one ``lax.fori_loop`` over a [N, 7] state
(x, y, vx, vy, dx, dy, tau); the potential gradient uses the same
finite-difference scheme as the external package.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...data.reader import Reader

MAX_SPEED_MULTIPLIER = 1.3
OUT_OF_VIEW_FACTOR = 0.5
TWO_PHI_DEG = 200.0


def desired_directions(state):
    dest = state[:, 4:6]
    pos = state[:, 0:2]
    diff = dest - pos
    norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    return jnp.where(norm > 0, diff / jnp.where(norm > 0, norm, 1.0), 0.0)


def _pedped_value(r_ab, speeds, dirs, delta_t, v0, sigma):
    """V(b) over pairwise displacements r_ab[i, j] = r_i - r_j."""
    n = r_ab.shape[0]
    speeds_b = speeds[None, :, None]  # [1, N, 1]
    e_b = dirs[None, :, :]  # [1, N, 2]
    moved = r_ab - delta_t * speeds_b * e_b
    norm_r = jnp.linalg.norm(r_ab, axis=-1)
    norm_m = jnp.linalg.norm(moved, axis=-1)
    in_sqrt = (norm_r + norm_m) ** 2 - (delta_t * speeds[None, :]) ** 2
    b = 0.5 * jnp.sqrt(jnp.maximum(in_sqrt, 1e-12))
    value = v0 * jnp.exp(-b / sigma)
    return value * (1.0 - jnp.eye(n))  # no self-interaction


def pedped_grad(r_ab, speeds, dirs, delta_t, v0, sigma, delta=1e-3):
    """Finite-difference gradient of V wrt r_ab (matches the package)."""
    dx = jnp.array([delta, 0.0])
    dy = jnp.array([0.0, delta])
    v = _pedped_value(r_ab, speeds, dirs, delta_t, v0, sigma)
    dvdx = (_pedped_value(r_ab + dx, speeds, dirs, delta_t, v0, sigma) - v) / delta
    dvdy = (_pedped_value(r_ab + dy, speeds, dirs, delta_t, v0, sigma) - v) / delta
    return jnp.stack([dvdx, dvdy], axis=-1)  # [N, N, 2]


def field_of_view_weights(e, f, twophi_deg=TWO_PHI_DEG, out_factor=OUT_OF_VIEW_FACTOR):
    """Weight forces outside the 2*phi field of view by out_factor."""
    cos_phi = jnp.cos(jnp.deg2rad(0.5 * twophi_deg))
    in_sight = jnp.einsum("aj,abj->ab", e, f) > cos_phi * jnp.linalg.norm(f, axis=-1)
    return jnp.where(in_sight, 1.0, out_factor)


def simulate(initial_state, n_steps: int, delta_t: float, v0: float, sigma: float):
    """Run the social-force model; returns states [n_steps, N, 7]."""
    initial_state = jnp.asarray(initial_state)
    initial_speeds = jnp.linalg.norm(initial_state[:, 2:4], axis=-1)
    max_speeds = MAX_SPEED_MULTIPLIER * initial_speeds

    def step(state):
        e = desired_directions(state)
        vel = state[:, 2:4]
        tau = state[:, 6:7]
        f0 = (initial_speeds[:, None] * e - vel) / tau

        r_ab = state[:, None, 0:2] - state[None, :, 0:2]
        f_ab = -pedped_grad(r_ab, initial_speeds, e, delta_t, v0, sigma)
        w = field_of_view_weights(e, -f_ab)
        f_ped = jnp.sum(w[:, :, None] * f_ab, axis=1)

        force = f0 + f_ped
        desired_velocity = vel + delta_t * force
        speed = jnp.linalg.norm(desired_velocity, axis=-1)
        factor = jnp.minimum(1.0, max_speeds / jnp.maximum(speed, 1e-12))
        new_vel = desired_velocity * factor[:, None]

        return jnp.concatenate(
            [state[:, 0:2] + new_vel * delta_t, new_vel, state[:, 4:]], axis=-1
        )

    def body(_, carry):
        state, out, i = carry
        state = step(state)
        out = out.at[i].set(state)
        return state, out, i + 1

    out = jnp.zeros((n_steps,) + initial_state.shape)
    _, out, _ = jax.lax.fori_loop(
        0, n_steps, lambda k, c: body(k, c), (initial_state, out, 0)
    )
    return out


@functools.partial(jax.jit, static_argnames=("n_steps",))
def _simulate_jit(initial_state, n_steps, delta_t, v0, sigma):
    return simulate(initial_state, n_steps, delta_t, v0, sigma)


def _dest_by_interpolation(xs, ys, pred_length):
    """Linear extrapolation from the last two points (scipy interp1d style)."""
    if len(xs) == 1:
        return [xs[-1], ys[-1]]
    dx = xs[-1] - xs[-2]
    dy = ys[-1] - ys[-2]
    return [xs[-1] + dx * pred_length, ys[-1] + dy * pred_length]


def predict(input_paths, dest_dict=None, dest_type="interp", sf_params=(0.5, 2.1, 0.3),
            predict_all=True, n_predict=12, obs_length=9):
    """Path-level API mirroring the reference's socialforce.predict."""
    pred_length = n_predict
    primary = input_paths[0]
    start_frame = primary[obs_length - 1].frame

    initial_state = []
    for path in input_paths:
        ped_id = path[0].pedestrian
        past = [t for t in path if t.frame <= start_frame]
        past_frames = [t.frame for t in path if t.frame <= start_frame]
        future = [t for t in path if t.frame > start_frame]
        if start_frame not in past_frames:
            continue
        curr = past[-1]

        if len(past) >= 4:
            stride, prev = 3, past[-4]
        else:
            stride, prev = len(past) - 1, past[-len(past)]
        if stride == 0:
            v_x = v_y = 0.0
        else:
            diff = np.array([curr.x - prev.x, curr.y - prev.y])
            theta = np.arctan2(diff[1], diff[0])
            speed = np.linalg.norm(diff) / (stride * 0.4)
            v_x, v_y = speed * np.cos(theta), speed * np.sin(theta)

        if dest_type == "true":
            if dest_dict is None:
                raise ValueError("dest_dict required for dest_type='true'")
            d_x, d_y = dest_dict[ped_id]
        elif dest_type == "interp":
            d_x, d_y = _dest_by_interpolation(
                [t.x for t in past], [t.y for t in past], pred_length
            )
        elif dest_type == "vel":
            d_x, d_y = pred_length * v_x, pred_length * v_y
        elif dest_type == "pred_end":
            d_x, d_y = future[-1].x, future[-1].y
        else:
            raise NotImplementedError(dest_type)

        initial_state.append([curr.x, curr.y, v_x, v_y, d_x, d_y])

    fps = 20
    sampling_rate = int(fps / 2.5)
    tau, v0, sigma = sf_params

    if len(initial_state):
        state = np.asarray(initial_state, dtype=np.float64)
        state = np.concatenate([state, np.full((len(state), 1), tau)], axis=-1)
        # pad the agent axis to a bucket (one compile per bucket) and pin the
        # tiny host-side simulation to the CPU backend
        from ...data.batching import agent_bucket

        n_real = len(state)
        n_pad = agent_bucket(n_real)
        if n_pad > n_real:
            far = np.zeros((n_pad - n_real, 7))
            far[:, 0:2] = 1e6  # parked far away: no interaction with real peds
            far[:, 4:6] = 1e6
            far[:, 6] = tau
            state = np.concatenate([state, far], axis=0)
        with jax.default_device(jax.devices("cpu")[0]):
            states = np.asarray(
                _simulate_jit(state, pred_length * sampling_rate, 1.0 / fps, v0, sigma)
            )[:, :n_real]
        states = states[::sampling_rate]  # every 8th step starting at step 1
    else:
        past = [t for t in input_paths[0] if t.frame == start_frame]
        states = np.stack([[[past[0].x, past[0].y]] for _ in range(pred_length)])

    primary_track = states[:, 0, 0:2]
    neighbours_tracks = states[:, 1:, 0:2]
    if not predict_all:
        neighbours_tracks = []
    return {0: (primary_track, neighbours_tracks)}
