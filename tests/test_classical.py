"""Behavioural tests for the social-force and native ORCA predictors."""

import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.data.rows import TrackRow
from trajnetplusplusbaselines_tpu.models.classical import constant_velocity


def headon_paths():
    """Two pedestrians walking straight toward each other (collision_test shape)."""
    p1 = [TrackRow(i, 1, 0.1, 6.2 - 0.4 * i) for i in range(9)]
    p2 = [TrackRow(i, 2, 0.0, -6.2 + 0.4 * i) for i in range(9)]
    return [p1, p2]


def solo_path():
    return [[TrackRow(i, 1, 0.1, 6.2 - 0.4 * i) for i in range(9)]]


def test_cv_headon_collides():
    from trajnetplusplusbaselines_tpu.metrics import batch as mbatch

    out = constant_velocity.predict(headon_paths(), n_predict=12, obs_length=9)
    prim, neigh = np.asarray(out[0][0]), np.asarray(out[0][1])
    pred = np.stack([prim, neigh[:, 0]]).reshape(2, 12, 2)
    # the segment-interpolated metric catches the mid-frame crossing
    assert mbatch.pred_col(pred) == 1.0


def test_orca_headon_avoids():
    from trajnetplusplusbaselines_tpu.models.classical import orca

    out = orca.predict(headon_paths(), n_predict=12, obs_length=9)
    prim, neigh = np.asarray(out[0][0]), np.asarray(out[0][1])
    assert prim.shape == (12, 2) and neigh.shape == (12, 1, 2)
    d = np.linalg.norm(prim - neigh[:, 0], axis=-1)
    # ORCA guarantees >= 2 * radius separation (radius 0.4)
    assert d.min() >= 2 * 0.4 - 1e-3
    # both agents still make progress toward their goals
    assert prim[-1, 1] < 0
    assert neigh[-1, 0, 1] > 0


def test_orca_solo_goes_straight():
    from trajnetplusplusbaselines_tpu.models.classical import orca

    out = orca.predict(solo_path(), n_predict=12, obs_length=9)
    prim = np.asarray(out[0][0])
    assert abs(prim[-1, 0] - 0.1) < 1e-3  # x unchanged
    assert prim[-1, 1] < prim[0, 1]  # keeps moving down


def test_socialforce_headon_avoids():
    from trajnetplusplusbaselines_tpu.models.classical import socialforce

    out = socialforce.predict(headon_paths(), n_predict=12, obs_length=9)
    prim, neigh = np.asarray(out[0][0]), np.asarray(out[0][1])
    assert prim.shape == (12, 2)
    d = np.linalg.norm(prim - neigh[:, 0], axis=-1)
    assert d.min() > 0.25  # repulsion keeps them apart
    assert prim[-1, 1] < 0 and neigh[-1, 0, 1] > 0  # they pass each other


def test_socialforce_solo_straight_with_speed_cap():
    from trajnetplusplusbaselines_tpu.models.classical import socialforce

    out = socialforce.predict(solo_path(), n_predict=12, obs_length=9)
    prim = np.asarray(out[0][0])
    assert abs(prim[-1, 0] - 0.1) < 1e-3
    speeds = np.linalg.norm(np.diff(prim, axis=0), axis=-1) / 0.4
    assert speeds.max() <= 1.3 * 1.0 + 1e-3  # initial speed 1.0 m/s, 1.3x cap


def test_orca_skips_unqualified_agents():
    from trajnetplusplusbaselines_tpu.models.classical import orca

    paths = headon_paths() + [[TrackRow(20, 3, 0.0, 0.0)]]  # appears post-obs
    out = orca.predict(paths, n_predict=12, obs_length=9)
    assert np.asarray(out[0][1]).shape[1] == 1  # extra agent skipped
