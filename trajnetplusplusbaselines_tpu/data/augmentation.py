"""Host-side scene normalization and augmentation.

Behavioural mirror of /root/reference/trajnetbaselines/augmentation.py:16-87 and
/root/reference/trajnetbaselines/lstm/utils.py:10-51, operating on the
``[T, num_tracks, 2]`` NaN-padded scene arrays produced by
``Reader.paths_to_xy``.  These run once per scene at data-load time on the
host; the device-side pipeline consumes the already-normalized tensors, so
none of this needs to be jitted.
"""

import math
from typing import Optional, Tuple

import numpy as np


def theta_rotation(xy: np.ndarray, theta: float) -> np.ndarray:
    """Rotate ``[..., 2]`` coordinates by theta (radians)."""
    ct, st = math.cos(theta), math.sin(theta)
    r = np.array([[ct, st], [-st, ct]])
    return xy @ r


def shift(xy: np.ndarray, center: np.ndarray) -> np.ndarray:
    return xy - center


def random_rotation(
    xy: np.ndarray, goals: Optional[np.ndarray] = None, rng: Optional[np.random.Generator] = None
):
    """Rotate the whole scene (and goals) by a uniform random angle."""
    if rng is None:
        theta = np.random.uniform(0.0, 2.0 * math.pi)
    else:
        theta = rng.uniform(0.0, 2.0 * math.pi)
    if goals is None:
        return theta_rotation(xy, theta)
    return theta_rotation(xy, theta), theta_rotation(goals, theta)


def center_scene(
    xy: np.ndarray, obs_length: int = 9, ped_id: int = 0, goals: Optional[np.ndarray] = None
):
    """Translate so the primary's last observation is the origin, then rotate
    so the primary's last observed velocity points "north" (+y).

    Returns (xy, rotation, center[, goals]); ``inverse_scene`` undoes it.
    """
    center = xy[obs_length - 1, ped_id].copy()
    xy = shift(xy, center)
    if goals is not None:
        goals = shift(goals, center)

    last = xy[obs_length - 1, ped_id]
    second_last = xy[obs_length - 2, ped_id]
    diff = last - second_last
    rotation = -math.atan2(diff[1], diff[0]) + math.pi / 2
    xy = theta_rotation(xy, rotation)
    if goals is not None:
        goals = theta_rotation(goals, rotation)
        return xy, rotation, center, goals
    return xy, rotation, center


def inverse_scene(xy: np.ndarray, rotation: float, center: np.ndarray) -> np.ndarray:
    xy = theta_rotation(xy, -rotation)
    return shift(xy, -center)


def drop_distant(xy: np.ndarray, r: float = 6.0) -> Tuple[np.ndarray, np.ndarray]:
    """Drop tracks that never come within r meters of the primary.

    Mirrors /root/reference/trajnetbaselines/lstm/lstm.py:16-22 (r = 6 m).
    """
    distance_2 = np.sum(np.square(xy - xy[:, 0:1]), axis=2)  # NaN where either absent
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        mask = np.nanmin(distance_2, axis=0) < r ** 2  # all-NaN track -> False
    return xy[:, mask], mask


def drop_unobserved(xy: np.ndarray, obs_length: int = 9) -> Tuple[np.ndarray, np.ndarray]:
    """Drop tracks absent at the last observation frame."""
    absent = np.isnan(xy[obs_length - 1]).any(axis=1)
    mask = ~absent
    return xy[:, mask], mask


def add_noise(
    observation: np.ndarray,
    thresh: float = 0.005,
    obs_length: int = 9,
    ped: str = "primary",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Uniform noise on observed frames of the primary or the neighbours."""
    sample = (rng.uniform if rng is not None else np.random.uniform)
    if ped == "primary":
        observation[:obs_length, 0] += sample(-thresh, thresh, observation[:obs_length, 0].shape)
    elif ped == "neigh":
        observation[:obs_length, 1:] += sample(-thresh, thresh, observation[:obs_length, 1:].shape)
    else:
        raise ValueError(f"unknown ped type {ped!r}")
    return observation
