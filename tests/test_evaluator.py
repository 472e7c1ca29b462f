"""Integration test: predict -> write -> evaluate on a synthetic dataset."""

import os
import types

import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.evaluator import (
    Table,
    preprocess_test,
    trajnet_evaluate,
    write_predictions,
)
from trajnetplusplusbaselines_tpu.evaluator.driver import get_predictions, list_test_datasets
from trajnetplusplusbaselines_tpu.models.classical import constant_velocity

from .helpers import make_synthetic_dataset


def make_args(tmp_path, dataset="synthset"):
    return types.SimpleNamespace(
        path=os.path.join(tmp_path, "DATA_BLOCK", dataset, "test_pred/"),
        obs_length=9,
        pred_length=12,
        modes=1,
        labels=None,
        disable_collision=False,
        write_only=False,
        goal_flag=False,
        output=["/cv.pkl"],
    )


@pytest.fixture
def dataset_tree(tmp_path):
    root = os.path.join(str(tmp_path), "DATA_BLOCK", "synthset")
    make_synthetic_dataset(root)
    return str(tmp_path)


def test_end_to_end_cv_evaluation(dataset_tree, monkeypatch):
    args = make_args(dataset_tree)
    os.makedirs(args.path, exist_ok=True)

    def cv_predictor(paths, goal):
        return constant_velocity.predict(
            paths, n_predict=args.pred_length, obs_length=args.obs_length
        )

    monkeypatch.chdir(dataset_tree)  # Results.png lands in tmp
    get_predictions({"cv_modes1": cv_predictor}, args)

    pred_file = os.path.join(args.path, "cv_modes1", "synth.ndjson")
    assert os.path.exists(pred_file)

    table = trajnet_evaluate(args)
    overall = table.results["cv_modes1"][32:40]
    n, ade, fde = overall[0], overall[1], overall[2]
    assert n == 4  # all synthetic scenes scored
    # synthetic tracks are perfectly linear: CV is exact
    assert ade == pytest.approx(0.0, abs=1e-6)
    assert fde == pytest.approx(0.0, abs=1e-6)
    # linear scene type got the two even scenes; type III the odd ones
    assert table.results["cv_modes1"][8] == 2
    assert table.results["cv_modes1"][16] == 2
    # CA subtype metrics counted for the odd scenes
    assert table.sub_results["cv_modes1"][8] == 2
    assert os.path.exists(os.path.join(dataset_tree, "Results.png"))


def test_skip_if_exists_caching(dataset_tree, capsys):
    args = make_args(dataset_tree)
    os.makedirs(os.path.join(args.path, "cv_modes1"), exist_ok=True)
    get_predictions({"cv_modes1": lambda p, g: pytest.fail("must not be called")}, args)
    assert "already exist" in capsys.readouterr().out


def test_preprocess_test_drops_late_tracks():
    from trajnetplusplusbaselines_tpu.data.rows import TrackRow

    scene = [
        [TrackRow(f, 1, float(f), 0.0) for f in range(21)],
        [TrackRow(f, 2, float(f), 1.0) for f in range(12, 21)],  # appears post-obs
    ]
    out = preprocess_test(scene, obs_len=9)
    assert len(out) == 1
    assert out[0][-1].frame == 8


def test_collision_test_gate_with_multimode_predictions(tmp_path):
    """Multimodal prediction files (interleaved prediction_number rows) must
    not crash the collision_test gate; mode 0 alone is judged."""
    from trajnetplusplusbaselines_tpu.data import SceneRow, TrackRow, writers
    from trajnetplusplusbaselines_tpu.evaluator.trajnet_evaluator import collision_test

    pred_dir = os.path.join(str(tmp_path), "test_pred", "m_modes2")
    os.makedirs(pred_dir)
    rows = [SceneRow(0, 1, 0, 20, 2.5, 0)]
    for mode in range(2):
        # two parallel straight tracks 2 m apart: never collide
        rows += [TrackRow(9 + t, 1, 0.1 * t, 0.0, mode, 0) for t in range(12)]
        if mode == 0:
            rows += [TrackRow(9 + t, 2, 0.1 * t, 2.0, mode, 0) for t in range(12)]
    with open(os.path.join(pred_dir, "collision_test.ndjson"), "w") as f:
        for r in rows:
            f.write(writers.trajnet(r) + "\n")

    args = types.SimpleNamespace(path=str(tmp_path) + "/test_pred/", pred_length=12)
    assert collision_test(["collision_test.ndjson"], "m_modes2", args) == "Pass"

    # mode 0 colliding, mode 1 clean -> judged on mode 0 -> Fail
    pred_dir2 = os.path.join(str(tmp_path), "test_pred", "m2_modes2")
    os.makedirs(pred_dir2)
    rows = [SceneRow(0, 1, 0, 20, 2.5, 0)]
    for mode in range(2):
        rows += [TrackRow(9 + t, 1, 0.1 * t, 0.0, mode, 0) for t in range(12)]
        if mode == 0:
            rows += [TrackRow(9 + t, 2, 0.1 * t, 0.05, mode, 0) for t in range(12)]
    with open(os.path.join(pred_dir2, "collision_test.ndjson"), "w") as f:
        for r in rows:
            f.write(writers.trajnet(r) + "\n")
    assert collision_test(["collision_test.ndjson"], "m2_modes2", args) == "Fail"


def test_col1_sentinel_when_neighbours_missing(dataset_tree, monkeypatch):
    """A primary-only predictor must trip the Col-I -1 sentinel."""
    args = make_args(dataset_tree)
    os.makedirs(args.path, exist_ok=True)

    def primary_only(paths, goal):
        out = constant_velocity.predict(
            paths, predict_all=False, n_predict=args.pred_length,
            obs_length=args.obs_length,
        )
        return out

    monkeypatch.chdir(dataset_tree)
    get_predictions({"cvp_modes1": primary_only}, args)
    args.output = ["/cvp.pkl"]
    table = trajnet_evaluate(args)
    overall = table.results["cvp_modes1"][32:40]
    assert overall[3] == -1  # pred_col sentinel propagated to the table


def test_multiprocess_prediction_fanout(dataset_tree, monkeypatch):
    """Simulated 2-host run: each process predicts its dataset slice, only
    process 0 publishes the rename, and the union covers every dataset
    (driver.get_predictions multi-host branch, parallel/multihost.py)."""
    import shutil

    from trajnetplusplusbaselines_tpu.evaluator import driver as drv

    # second dataset file so there is something to shard
    base = os.path.join(dataset_tree, "DATA_BLOCK", "synthset")
    for subset in ("test", "test_private"):
        shutil.copy(
            os.path.join(base, subset, "synth.ndjson"),
            os.path.join(base, subset, "synth2.ndjson"),
        )

    args = make_args(dataset_tree)
    os.makedirs(args.path, exist_ok=True)
    monkeypatch.chdir(dataset_tree)

    def cv_predictor(paths, goal):
        return constant_velocity.predict(
            paths, n_predict=args.pred_length, obs_length=args.obs_length
        )

    barriers = []
    monkeypatch.setattr(drv, "_multihost_runtime", lambda: True)
    from jax.experimental import multihost_utils

    monkeypatch.setattr(
        multihost_utils, "sync_global_devices", lambda name: barriers.append(name)
    )
    # identity broadcast: in this sequential single-runtime simulation each
    # simulated host's own exists-check IS process 0's published state
    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", lambda x: x)

    import jax

    import trajnetplusplusbaselines_tpu.parallel.multihost as mh

    for pi in range(2):
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        # fresh model dir state only on the first simulated host
        get_predictions({"cvmp_modes1": cv_predictor}, args)

    model_dir = os.path.join(args.path, "cvmp_modes1")
    assert os.path.exists(model_dir)
    files = sorted(os.listdir(model_dir))
    # the published dir holds EXACTLY process 0's 1-dataset slice (host 0
    # renamed at the end of its sequentially-simulated run; host 1 then saw
    # the published dir and skipped -- no .tmp left behind either)
    import trajnetplusplusbaselines_tpu.parallel.multihost as _mh
    datasets_all = list_test_datasets(args.path)
    expected = [d + ".ndjson" for d in _mh.shard_items(datasets_all, 0, 2)]
    assert files == sorted(expected)
    assert not os.path.exists(model_dir + ".tmp")
    assert any(b.startswith("pred-start") for b in barriers)
    assert any(b.startswith("published") for b in barriers)

    # the slice arithmetic covers both datasets across the two hosts
    datasets = list_test_datasets(args.path)
    parts = [list(mh.shard_items(datasets, pi, 2)) for pi in range(2)]
    assert sorted(sum(parts, [])) == sorted(datasets)
    assert all(len(p) == 1 for p in parts)


def test_fill_missing_backfills_only_absent_datasets(dataset_tree, capsys):
    """--fill_missing keeps an existing prediction dir and predicts only the
    test datasets it lacks (the collision_test gate backfill path); a
    complete dir skips without calling the predictor (VERDICT r4 #5)."""
    import shutil

    args = make_args(dataset_tree)
    os.makedirs(args.path, exist_ok=True)

    def cv_predictor(paths, goal):
        return constant_velocity.predict(
            paths, n_predict=args.pred_length, obs_length=args.obs_length
        )

    get_predictions({"cv_modes1": cv_predictor}, args)
    assert os.path.exists(os.path.join(args.path, "cv_modes1", "synth.ndjson"))

    # a second test dataset arrives after the dir was created
    test_dir = args.path.replace("test_pred/", "test")
    priv_dir = args.path.replace("test_pred/", "test_private")
    shutil.copy(os.path.join(test_dir, "synth.ndjson"),
                os.path.join(test_dir, "synth2.ndjson"))
    shutil.copy(os.path.join(priv_dir, "synth.ndjson"),
                os.path.join(priv_dir, "synth2.ndjson"))

    # without fill_missing: dir exists -> skip, no backfill
    get_predictions({"cv_modes1": cv_predictor}, args)
    assert not os.path.exists(os.path.join(args.path, "cv_modes1", "synth2.ndjson"))

    calls = []

    def counting_predictor(paths, goal):
        calls.append(1)
        return cv_predictor(paths, goal)

    args.fill_missing = True
    before = os.path.getmtime(os.path.join(args.path, "cv_modes1", "synth.ndjson"))
    get_predictions({"cv_modes1": counting_predictor}, args)
    assert os.path.exists(os.path.join(args.path, "cv_modes1", "synth2.ndjson"))
    # only synth2's 4 scenes were predicted; synth.ndjson untouched
    assert len(calls) == 4
    assert os.path.getmtime(
        os.path.join(args.path, "cv_modes1", "synth.ndjson")) == before

    # now complete: fill_missing skips without predicting
    calls.clear()
    get_predictions({"cv_modes1": counting_predictor}, args)
    assert calls == []
    assert "already exist" in capsys.readouterr().out
