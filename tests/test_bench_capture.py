"""bench.py capture robustness: the ONE-JSON-line invariant must survive a
dead/stalling TPU tunnel (round-3 postmortem: a stalled tunnel turned into a
driver timeout with zero output — VERDICT r3 item #1).

These tests drive bench.main() with _run_attempt stubbed out, so they cover
the watchdog orchestration (retry, last-good persistence, stale fallback)
without touching a device.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _run_main(monkeypatch, capsys, tmp_path, attempts, last_good=None):
    """Drive bench.main() with scripted attempt results; return (rc, stdout)."""
    path = tmp_path / ".bench_last_good.json"
    if last_good is not None:
        path.write_text(json.dumps(last_good))
    monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(path))
    monkeypatch.setattr(bench, "ATTEMPT_DEADLINES", (1,) * len(attempts))
    monkeypatch.setattr(bench, "DEAD_TUNNEL_DEADLINES", (1,) * len(attempts))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    it = iter(attempts)
    monkeypatch.setattr(bench, "_run_attempt", lambda deadline: next(it))
    rc = bench.main()
    return rc, capsys.readouterr().out, path


GOOD = {"metric": "dlstm_rollout_scenes_per_sec", "value": 1.0,
        "unit": "u", "vs_baseline": 1.0}


def test_success_prints_one_line_and_persists(monkeypatch, capsys, tmp_path):
    rc, out, path = _run_main(monkeypatch, capsys, tmp_path, [GOOD])
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0]) == GOOD
    assert json.loads(path.read_text()) == GOOD  # last-good persisted


def test_retry_then_success(monkeypatch, capsys, tmp_path):
    rc, out, _ = _run_main(monkeypatch, capsys, tmp_path, [None, GOOD])
    assert rc == 0
    assert json.loads(out.strip().splitlines()[-1]) == GOOD


def test_all_stalled_falls_back_to_stale(monkeypatch, capsys, tmp_path):
    rc, out, _ = _run_main(
        monkeypatch, capsys, tmp_path, [None, None], last_good=GOOD)
    assert rc == 0
    lines = out.strip().splitlines()
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed.pop("stale") is True
    assert parsed == GOOD


def test_no_last_good_fails_loudly(monkeypatch, capsys, tmp_path):
    rc, out, _ = _run_main(monkeypatch, capsys, tmp_path, [None, None])
    assert rc == 1
    assert out.strip() == ""  # no half-results on stdout


def test_repo_last_good_is_valid():
    """The committed fallback must itself satisfy the JSON-line contract."""
    committed = Path(bench.LAST_GOOD_PATH)
    parsed = json.loads(committed.read_text())
    for key in ("metric", "value", "unit", "vs_baseline", "train_mfu_pct"):
        assert key in parsed


def test_train_cost_model_sane():
    fwd_f, fwd_b = bench.dlstm_cost_model(8, 8)
    tr_f, tr_b = bench.dlstm_train_cost_model(a=8, batch=8)
    assert tr_f > 3 * fwd_f * 0.99  # fwd+bwd ~ 3x fwd matmul flops
    assert tr_b > fwd_b  # bwd re-reads activations + Adam traffic
