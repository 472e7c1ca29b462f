"""collect_results: seed aggregation, --merge overlay, col_test annotation."""

import json
import os

import pytest

from .helpers import make_synthetic_dataset


@pytest.fixture
def tree(tmp_path, monkeypatch):
    root = os.path.join(str(tmp_path), "DATA_BLOCK", "synthset")
    make_synthetic_dataset(root)
    monkeypatch.chdir(str(tmp_path))
    return str(tmp_path)


def _write_cv_predictions(names):
    import types

    from trajnetplusplusbaselines_tpu.evaluator.driver import get_predictions
    from trajnetplusplusbaselines_tpu.models.classical import constant_velocity

    args = types.SimpleNamespace(
        path="DATA_BLOCK/synthset/test_pred/", obs_length=9, pred_length=12,
        modes=1,
    )
    os.makedirs(args.path, exist_ok=True)

    def cv(paths, goal):
        return constant_velocity.predict(paths, n_predict=12, obs_length=9)

    get_predictions({n: cv for n in names}, args)
    return args


def test_collect_groups_merge_and_gate(tree):
    from trajnetplusplusbaselines_tpu.tools import collect_results

    _write_cv_predictions(["cv_seed1_modes1", "cv_seed2_modes1"])

    # a recorded gate verdict for one seed (the collision_gate.json path);
    # the other seed stays NA
    with open("DATA_BLOCK/synthset/collision_gate.json", "w") as f:
        json.dump({"cv_seed1_modes1": "Pass"}, f)

    out = os.path.join(tree, "out.json")
    collect_results.main(["--path", "synthset", "--out", out, "--cache", ""])
    data = json.load(open(out))

    assert set(data["per_model"]) == {"cv_seed1_modes1", "cv_seed2_modes1"}
    assert data["per_model"]["cv_seed1_modes1"]["col_test"] == "Pass"
    assert data["per_model"]["cv_seed2_modes1"]["col_test"] == "NA"
    g = data["groups"]["cv_seed*_modes1"]
    assert g["ade"]["n"] == 2
    # synthetic tracks are linear: CV is exact
    assert g["ade"]["mean"] == pytest.approx(0.0, abs=1e-6)
    assert g["col_test"] == {"pass": 1, "fail": 0, "na": 1}

    # --merge overlays new rows and keeps rows whose prediction dirs are
    # gone from disk (the round-4 lesson: evidence must survive cleanup)
    stale = {"per_model": {"old_model_modes1": {
        "N": 1, "ade": 9.0, "fde": 9.0, "col_i": 0.0, "col_ii": 0.0,
        "topk_ade": 9.0, "topk_fde": 9.0, "nll": 0.0}}, "groups": {}}
    with open(out, "w") as f:
        json.dump(stale, f)
    collect_results.main(
        ["--path", "synthset", "--out", out, "--cache", "", "--merge"])
    data = json.load(open(out))
    assert "old_model_modes1" in data["per_model"]  # survived
    assert "cv_seed1_modes1" in data["per_model"]  # re-collected
    assert data["groups"]["old_model_modes1"]["ade"]["mean"] == 9.0
