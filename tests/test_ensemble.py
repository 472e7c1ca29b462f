"""Seed-ensemble trainer: one vmapped process == N sequential seed runs."""

import os

import numpy as np
import pytest

from .helpers import make_synthetic_dataset


@pytest.fixture
def data_tree(tmp_path, monkeypatch):
    root = os.path.join(str(tmp_path), "DATA_BLOCK", "synthset")
    make_synthetic_dataset(root)
    monkeypatch.chdir(str(tmp_path))
    return str(tmp_path)


def test_ensemble_matches_sequential_runs(data_tree):
    """Member k of the vmapped ensemble reproduces the sequential trainer's
    checkpoint for seed k (same init key, shuffle rng and augmentation key
    stream), so the 5-seed protocol is exactly one process."""
    import jax

    from trajnetplusplusbaselines_tpu.trainers import ensemble as ens
    from trajnetplusplusbaselines_tpu.trainers import lstm as seq
    from trajnetplusplusbaselines_tpu.utils.checkpoint import load_state

    common = [
        "--epochs", "2", "--path", "synthset", "--type", "occupancy",
        "--n", "4", "--batch_size", "2", "--save_every", "10", "--augment",
    ]
    ens.main(argv=common + ["--seeds", "7", "11"])
    ens_params = {
        s: load_state(f"OUTPUT_BLOCK/synthset/lstm_occupancy_seed{s}.pkl.state")["params"]
        for s in (7, 11)
    }

    for s in (7, 11):
        seq.main(argv=common + ["--seed", str(s), "-o", f"seq{s}"])
        seq_params = load_state(
            f"OUTPUT_BLOCK/synthset/lstm_occupancy_seq{s}.pkl.state"
        )["params"]
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-9
            ),
            ens_params[s], seq_params,
        )
