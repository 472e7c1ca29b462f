import math

import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.data.rows import TrackRow
from trajnetplusplusbaselines_tpu.metrics import (
    Metrics,
    average_l2,
    collision,
    final_l2,
    topk,
)
from trajnetplusplusbaselines_tpu.metrics import batch as mbatch


def _path(xs, ys, ped=0, prediction_number=None):
    return [
        TrackRow(i * 10, ped, float(x), float(y), prediction_number, 0)
        for i, (x, y) in enumerate(zip(xs, ys))
    ]


def test_average_and_final_l2():
    p1 = _path(range(12), [0] * 12)
    p2 = _path(range(12), [1] * 12)
    assert average_l2(p1, p2, n_predictions=12) == pytest.approx(1.0)
    assert final_l2(p1, p2) == pytest.approx(1.0)


def test_collision_direct_hit():
    # two paths crossing at the same frame
    p1 = _path([0, 1, 2], [0, 0, 0])
    p2 = _path([2, 1, 0], [0, 0, 0])
    assert collision(p1, p2, n_predictions=3)


def test_collision_parallel_far():
    p1 = _path([0, 1, 2], [0, 0, 0])
    p2 = _path([0, 1, 2], [5, 5, 5])
    assert not collision(p1, p2, n_predictions=3)


def test_collision_interpolated_midpoint():
    # paths cross between frames; endpoints are far but midpoints collide
    p1 = _path([0, 2], [0, 0])
    p2 = _path([1, 1], [0.95, -0.95])  # crosses x-path at its midpoint region
    assert collision(p1, p2, n_predictions=2)


def test_collision_disjoint_frames():
    p1 = _path([0, 1, 2], [0, 0, 0])
    p2 = [TrackRow(999, 1, 0.0, 0.0)]
    assert not collision(p1, p2, n_predictions=3)


def test_topk_picks_best_mode():
    gt = _path(range(12), [0] * 12)
    mode0 = _path(range(12), [2] * 12, prediction_number=0)
    mode1 = _path(range(12), [0.5] * 12, prediction_number=1)
    best_ade, best_fde = topk(mode0 + mode1, gt)
    assert best_ade == pytest.approx(0.5)
    assert best_fde == pytest.approx(0.5)


def test_metrics_record_col1_sentinel():
    a = Metrics(N=2, pred_col=1.0)
    b = Metrics(N=3, pred_col=-1)
    a += b
    assert a.N == 5
    assert a.pred_col == -1


def test_metrics_avg_vals_percent():
    m = Metrics(N=200, average_l2=100.0, final_l2=200.0, gt_col=20, pred_col=10)
    m.avg_vals()
    assert m.average_l2 == pytest.approx(0.5)
    assert m.final_l2 == pytest.approx(1.0)
    assert m.gt_col == pytest.approx(10.0)  # percent
    assert m.pred_col == pytest.approx(5.0)


def test_batch_metrics_match_row_metrics():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(3, 12, 2))
    gt = pred + rng.normal(scale=0.1, size=(3, 12, 2))
    a = mbatch.ade(pred, gt)
    expected = np.mean(np.linalg.norm(pred[0] - gt[0], axis=-1))
    assert a == pytest.approx(expected)

    # collision equivalence with the row-level oracle
    p_rows = _path(pred[0, :, 0], pred[0, :, 1])
    n_rows = _path(gt[1, :, 0], gt[1, :, 1], ped=1)
    row_col = collision(p_rows, n_rows, n_predictions=12)
    arr_col = mbatch.gt_col(pred, gt)
    assert bool(arr_col) == row_col


def test_batch_pred_col_nan_neighbours():
    pred = np.zeros((2, 12, 2))
    pred[1] = np.nan
    assert mbatch.pred_col(pred) == 0.0


def test_nll_prefers_gt_near_samples():
    from trajnetplusplusbaselines_tpu.metrics import nll

    rng = np.random.default_rng(0)
    # 50 modes scattered around a straight path
    modes = []
    for m in range(50):
        noise = rng.normal(scale=0.3, size=(12, 2))
        modes += _path(np.arange(12) + noise[:, 0], noise[:, 1], prediction_number=m)
    gt_near = _path(np.arange(12), [0.0] * 12)
    gt_far = _path(np.arange(12), [25.0] * 12)
    nll_near = nll(modes, gt_near)
    nll_far = nll(modes, gt_far)
    assert nll_near < nll_far
    assert nll_far <= 20.0 + 1e-6  # clipped at the log-pdf lower bound
