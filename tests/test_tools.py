"""Tests for the tooling layer: interactions, splitter, plot_log, get_dest."""

import json
import os

import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.data import interactions
from trajnetplusplusbaselines_tpu.tools import create_validation, get_dest, plot_log

from .helpers import make_synthetic_dataset


def _scene(primary_xy, neighbour_xy):
    xy = np.stack([primary_xy, neighbour_xy], axis=1)  # [T, 2, 2]
    return xy


def test_collision_avoidance_detects_headon():
    t = np.arange(21, dtype=float)
    primary = np.stack([np.zeros(21), t * 0.4], axis=-1)  # north
    neigh = np.stack([np.zeros(21) + 0.1, 16.0 - t * 0.4], axis=-1)  # south, ahead
    xy = _scene(primary, neigh)
    assert interactions.collision_avoidance(xy).tolist() == [True]
    assert interactions.leader_follower(xy).tolist() == [False]


def test_leader_follower_detects_same_direction():
    t = np.arange(21, dtype=float)
    primary = np.stack([np.zeros(21), t * 0.4], axis=-1)
    neigh = np.stack([np.zeros(21), t * 0.4 + 2.0], axis=-1)  # ahead, same way
    xy = _scene(primary, neigh)
    assert interactions.leader_follower(xy).tolist() == [True]
    assert interactions.collision_avoidance(xy).tolist() == [False]


def test_group_detects_side_by_side():
    t = np.arange(21, dtype=float)
    primary = np.stack([np.zeros(21), t * 0.4], axis=-1)
    neigh = np.stack([np.zeros(21) + 0.5, t * 0.4], axis=-1)
    xy = _scene(primary, neigh)
    assert interactions.group(xy).tolist() == [True]


def test_interaction_type_codes():
    t = np.arange(21, dtype=float)
    primary = np.stack([np.zeros(21), t * 0.4], axis=-1)
    neigh = np.stack([np.zeros(21) + 0.1, 16.0 - t * 0.4], axis=-1)
    assert 2 in interactions.interaction_type(_scene(primary, neigh))


def test_socialforce_eval_interaction_filter():
    """--interactions keeps CA neighbours, drops distant ones (the reference's
    commented-out filter, socialforce_eval.py:36-40)."""
    from trajnetplusplusbaselines_tpu.data import TrackRow
    from trajnetplusplusbaselines_tpu.models.classical.socialforce_eval import (
        filter_interacting_neighbours,
    )

    t = np.arange(21, dtype=float)

    def track(ped, xs, ys):
        return [TrackRow(int(f * 10), ped, float(x), float(y), 0)
                for f, x, y in zip(t, xs, ys)]

    primary = track(1, np.zeros(21), t * 0.4)
    headon = track(2, np.zeros(21) + 0.1, 16.0 - t * 0.4)
    far = track(3, np.zeros(21) + 50.0, np.zeros(21) + 50.0)

    kept = filter_interacting_neighbours([primary, headon, far])
    assert [p[0].pedestrian for p in kept] == [1, 2]


def test_create_validation_split(tmp_path):
    root = make_synthetic_dataset(os.path.join(str(tmp_path), "src", "synthset"))
    create_validation.main([
        "--path", "synthset",
        "--data_root", os.path.join(str(tmp_path), "src"),
        "--output_root", os.path.join(str(tmp_path), "out"),
        "--val_ratio", "0.25", "--test_ratio", "0.25", "--seed", "0",
    ])
    dest = os.path.join(str(tmp_path), "out", "synthset_split")
    counts = {}
    for subset in ("train", "val", "test", "test_private"):
        path = os.path.join(dest, subset, "synth.ndjson")
        assert os.path.exists(path)
        with open(path) as f:
            counts[subset] = sum(1 for line in f if '"scene"' in line)
    assert counts["test"] == counts["test_private"]
    assert counts["train"] + counts["val"] + counts["test"] == 4


def test_get_dest_last_position(tmp_path):
    root = make_synthetic_dataset(os.path.join(str(tmp_path), "synthset"))
    src = os.path.join(root, "train", "synth.ndjson")
    dest = get_dest.get_dest(src)
    # ped 1's last row across the file: scene 3 frames end at 3200
    with open(src) as f:
        rows = [json.loads(l)["track"] for l in f if '"track"' in l]
    ped1 = [r for r in rows if r["p"] == 1]
    last = max(ped1, key=lambda r: r["f"])
    assert dest[1] == [last["x"], last["y"]]


def test_plot_log_reads_records(tmp_path):
    log = os.path.join(str(tmp_path), "model.log")
    with open(log, "w") as f:
        f.write(json.dumps({"type": "train-epoch", "epoch": 1, "loss": 1.0, "time": 2.0}) + "\n")
        f.write(json.dumps({"type": "val-epoch", "epoch": 1, "loss": 0.9, "time": 1.0}) + "\n")
        f.write("not json\n")
    records = plot_log.read_log(log)
    assert len(records["train-epoch"]) == 1
    assert records["val-epoch"][0]["loss"] == 0.9


def test_orbax_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from trajnetplusplusbaselines_tpu.utils import checkpoint as ckpt

    state = {"epoch": 3, "params": {"w": np.arange(6.0).reshape(2, 3)}}
    d = os.path.join(str(tmp_path), "ckpt")
    ckpt.save_orbax(state, d)
    restored = ckpt.load_orbax(d)
    assert int(restored["epoch"]) == 3
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference mount absent")
def test_reference_control_preflight():
    """A bad flag must die at preflight in seconds, a good argv must pass —
    and neither may touch the real OUTPUT_BLOCK (VERDICT r4 #7: two control
    slots were lost to launch faults the preflight now catches)."""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "scripts", "reference_control.py")
    good = [sys.executable, script, "--preflight", "--type", "vanilla",
            "--path", "trajdata_split", "--seed", "42",
            "--output", "preflight_unittest"]
    r = subprocess.run(good, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "PREFLIGHT OK" in r.stdout
    # the scratch-cwd guard: nothing written under the repo's OUTPUT_BLOCK
    assert not os.path.exists(
        "OUTPUT_BLOCK/trajdata_split/lstm_vanilla_preflight_unittest.pkl.log")

    bad = good[:3] + ["--bogus_flag_that_does_not_exist"]
    r = subprocess.run(bad, capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
