"""Constant-velocity predictor.

Behavioural mirror of /root/reference/trajnetbaselines/classical/constant_velocity.py:4-20:
extrapolate the last observed velocity of every track.  Also exposes a dense
batched form used by the vectorized evaluator and the benchmark.
"""

import numpy as np

from ...data.reader import Reader


def predict_xy(xy: np.ndarray, n_predict: int = 12) -> np.ndarray:
    """Dense CV rollout. xy [..., T, A, 2]; output [..., n_predict, A, 2]."""
    curr_position = xy[..., -1, :, :]
    curr_velocity = xy[..., -1, :, :] - xy[..., -2, :, :]
    steps = np.arange(1, n_predict + 1)[:, None, None]  # [n_predict, 1, 1]
    return curr_position[..., None, :, :] + steps * curr_velocity[..., None, :, :]


def predict(input_paths, predict_all: bool = True, n_predict: int = 12, obs_length: int = 9):
    """Path-level API: {mode: (primary [n,2], neighbours [n,Nn,2])}."""
    xy = Reader.paths_to_xy(input_paths)
    output_scenes = predict_xy(xy, n_predict)

    output_primary = output_scenes[-n_predict:, 0]
    output_neighs = output_scenes[-n_predict:, 1:]
    if not predict_all:
        output_neighs = []
    return {0: (output_primary, output_neighs)}
