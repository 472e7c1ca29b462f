"""Trainer integration tests: train, checkpoint, resume, predict (CPU, tiny)."""

import os

import numpy as np
import pytest

from .helpers import make_synthetic_dataset


@pytest.fixture
def data_tree(tmp_path, monkeypatch):
    root = os.path.join(str(tmp_path), "DATA_BLOCK", "synthset")
    make_synthetic_dataset(root)
    os.symlink(
        os.path.join(root, "val"), os.path.join(root, "val_link")
    ) if False else None
    monkeypatch.chdir(str(tmp_path))
    return str(tmp_path)


def test_lstm_trainer_end_to_end(data_tree):
    from trajnetplusplusbaselines_tpu.trainers import lstm as lstm_trainer

    lstm_trainer.main(argv=[
        "--epochs", "2", "--path", "synthset", "--type", "occupancy",
        "--n", "4", "--batch_size", "2", "--save_every", "1",
        "-o", "t1", "--augment",
    ])
    out = "OUTPUT_BLOCK/synthset/lstm_occupancy_t1.pkl"
    assert os.path.exists(out)
    assert os.path.exists(out + ".state")
    assert os.path.exists(out + ".epoch1")

    # loss decreased over epochs
    from trajnetplusplusbaselines_tpu.tools.plot_log import read_log

    records = read_log(out + ".log")
    losses = [r["loss"] for r in records["train-epoch"]]
    assert len(losses) == 2
    assert losses[-1] < losses[0]
    # val ran (synthetic tree has a val split)
    assert len(records["val-epoch"]) == 2

    # predictor roundtrip through the checkpoint
    from trajnetplusplusbaselines_tpu.utils.checkpoint import load_predictor
    from trajnetplusplusbaselines_tpu.data import Reader

    predictor = load_predictor(out)
    reader = Reader("DATA_BLOCK/synthset/test/synth.ndjson", scene_type="paths")
    _, paths = next(reader.scenes())
    result = predictor(paths, np.zeros((len(paths), 2)))
    assert result[0][0].shape == (12, 2)

    # resume with --load-full-state continues from the saved epoch
    lstm_trainer.main(argv=[
        "--epochs", "3", "--path", "synthset", "--type", "occupancy",
        "--n", "4", "--batch_size", "2", "--save_every", "10",
        "-o", "t1", "--load-full-state", out + ".state",
    ])
    records = read_log(out + ".log")  # append mode keeps old records
    epochs = [r["epoch"] for r in records["train-epoch"]]
    assert 3 in epochs


def test_lstm_nonstrict_load(data_tree):
    from trajnetplusplusbaselines_tpu.trainers import lstm as lstm_trainer

    lstm_trainer.main(argv=[
        "--epochs", "1", "--path", "synthset", "--type", "vanilla",
        "--batch_size", "2", "-o", "t2",
    ])
    # transfer vanilla weights into a pooled model: pool params are skipped
    lstm_trainer.main(argv=[
        "--epochs", "1", "--path", "synthset", "--type", "occupancy", "--n", "4",
        "--batch_size", "2", "-o", "t3",
        "--nonstrict-load-state", "OUTPUT_BLOCK/synthset/lstm_vanilla_t2.pkl.state",
    ])
    assert os.path.exists("OUTPUT_BLOCK/synthset/lstm_occupancy_t3.pkl")


def test_sgan_trainer_smoke(data_tree):
    from trajnetplusplusbaselines_tpu.trainers import sgan as sgan_trainer

    sgan_trainer.main(argv=[
        "--epochs", "1", "--path", "synthset", "--type", "vanilla",
        "--batch_size", "2", "-o", "t1", "--k", "2",
    ])
    out = "OUTPUT_BLOCK/synthset/sgan_vanilla_t1.pkl"
    assert os.path.exists(out)

    from trajnetplusplusbaselines_tpu.utils.checkpoint import load_predictor
    from trajnetplusplusbaselines_tpu.data import Reader

    predictor = load_predictor(out)
    reader = Reader("DATA_BLOCK/synthset/test/synth.ndjson", scene_type="paths")
    _, paths = next(reader.scenes())
    result = predictor(paths, np.zeros((len(paths), 2)), modes=2)
    assert len(result) == 2
    # different noise per mode -> different primary predictions
    assert not np.allclose(result[0][0], result[1][0])


def test_vae_trainer_smoke(data_tree):
    from trajnetplusplusbaselines_tpu.trainers import vae as vae_trainer

    vae_trainer.main(argv=[
        "--epochs", "1", "--path", "synthset", "--type", "vanilla",
        "--batch_size", "2", "-o", "t1", "--k", "2",
    ])
    out = "OUTPUT_BLOCK/synthset/vae_vanilla_t1.pkl"
    assert os.path.exists(out)

    from trajnetplusplusbaselines_tpu.utils.checkpoint import load_predictor
    from trajnetplusplusbaselines_tpu.data import Reader

    predictor = load_predictor(out)
    reader = Reader("DATA_BLOCK/synthset/test/synth.ndjson", scene_type="paths")
    _, paths = next(reader.scenes())
    result = predictor(paths, np.zeros((len(paths), 2)), modes=2)
    assert len(result) == 2


def test_orbax_checkpoint_and_resume(data_tree):
    """--orbax writes an Orbax state dir beside the pickle, and
    --load-full-state accepts it in place of the pickle sidecar."""
    from trajnetplusplusbaselines_tpu.trainers import lstm as lstm_trainer

    lstm_trainer.main(argv=[
        "--epochs", "1", "--path", "synthset", "--type", "vanilla",
        "--batch_size", "2", "--save_every", "1", "-o", "orb", "--orbax",
    ])
    out = "OUTPUT_BLOCK/synthset/lstm_vanilla_orb.pkl"
    orbax_dir = out + ".orbax"
    assert os.path.isdir(orbax_dir)

    from trajnetplusplusbaselines_tpu.utils import checkpoint as ckpt

    via_orbax = ckpt.load_state(orbax_dir)
    via_pickle = ckpt.load_state(out + ".state")
    assert via_orbax["epoch"] == via_pickle["epoch"]
    np.testing.assert_array_equal(
        np.asarray(via_orbax["params"]["encoder"]["w_ih"]),
        np.asarray(via_pickle["params"]["encoder"]["w_ih"]),
    )

    # resume from the orbax directory
    lstm_trainer.main(argv=[
        "--epochs", "2", "--path", "synthset", "--type", "vanilla",
        "--batch_size", "2", "--save_every", "10", "-o", "orb",
        "--load-full-state", orbax_dir,
    ])
    from trajnetplusplusbaselines_tpu.tools.plot_log import read_log

    records = read_log(out + ".log")
    epochs = [r["epoch"] for r in records["train-epoch"]]
    assert epochs[-1] == 2  # continued past the restored epoch
