"""Mixed-precision training (--bf16): bf16 forward/backward, f32 masters.

Greenfield TPU capability (no reference analogue); the contract is (a) the
trainer runs end-to-end and learns, (b) master params / optimizer state /
losses stay f32, and (c) saved predictor pickles evaluate in f32 regardless
of the training compute dtype.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from .helpers import make_synthetic_dataset


@pytest.fixture
def data_tree(tmp_path, monkeypatch):
    root = os.path.join(str(tmp_path), "DATA_BLOCK", "synthset")
    make_synthetic_dataset(root)
    monkeypatch.chdir(str(tmp_path))
    return str(tmp_path)


def test_bf16_trainer_end_to_end(data_tree):
    from trajnetplusplusbaselines_tpu.trainers import lstm as lstm_trainer

    lstm_trainer.main(argv=[
        "--epochs", "2", "--path", "synthset", "--type", "occupancy",
        "--n", "4", "--batch_size", "2", "--save_every", "1",
        "-o", "bf16", "--augment", "--bf16",
    ])
    out = "OUTPUT_BLOCK/synthset/lstm_occupancy_bf16.pkl"
    assert os.path.exists(out)

    from trajnetplusplusbaselines_tpu.tools.plot_log import read_log

    records = read_log(out + ".log")
    losses = [r["loss"] for r in records["train-epoch"]]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # it learns in bf16

    # saved predictor: f32 weights, compute dtype cleared for evaluation
    from trajnetplusplusbaselines_tpu.utils.checkpoint import load_predictor

    predictor = load_predictor(out)
    assert predictor.model.compute_dtype is None
    leaf = jax.tree.leaves(predictor.params)[0]
    # masters are full precision (f32; f64 under the x64 test env), not bf16
    assert np.asarray(leaf).dtype in (np.float32, np.float64)


def test_bf16_step_tracks_f32_step():
    """One optimizer step in mixed precision stays close to the f32 step
    (bf16 has ~3 decimal digits; the *update direction* must agree)."""
    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.trainers.common import make_optimizer
    from trajnetplusplusbaselines_tpu.trainers.lstm import Trainer, step_lr

    def make(compute_dtype):
        model = LSTM(pool=None, embedding_dim=16, hidden_dim=32)
        if compute_dtype is not None:
            model.with_dtype(compute_dtype)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32),
            model.init_params(jax.random.PRNGKey(0)),
        )
        opt = make_optimizer()
        tr = Trainer(model, params, opt, step_lr(1e-3, 10),
                     batch_size=2, compute_dtype=compute_dtype)
        return tr

    rng = np.random.default_rng(0)
    t, s, a = 21, 2, 3
    xy = jnp.asarray(rng.normal(size=(t, s, a, 2)).cumsum(0) * 0.3,
                     jnp.float32)
    mask = jnp.ones((t, s, a), bool)
    goals = jnp.zeros((s, a, 2), jnp.float32)
    slot = jnp.ones((s, a), bool)
    scene = jnp.ones((s,), bool)

    results = {}
    for name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
        tr = make(dt)
        step = tr._train_step_core()
        carry = (tr.params, tr.opt_state)
        (params2, _), loss = step(carry, xy, mask, goals, slot, scene, None)
        results[name] = (params2, float(loss))

    assert np.isfinite(results["bf16"][1])
    # losses agree to bf16 resolution
    assert abs(results["bf16"][1] - results["f32"][1]) < 0.05 * (
        1.0 + abs(results["f32"][1])
    )
    # parameter updates point the same way (cosine similarity of the deltas)
    base = make(None).params
    d32 = np.concatenate([
        (np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(results["f32"][0]), jax.tree.leaves(base))
    ])
    d16 = np.concatenate([
        (np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(results["bf16"][0]), jax.tree.leaves(base))
    ])
    cos = float(d32 @ d16 / (np.linalg.norm(d32) * np.linalg.norm(d16)))
    assert cos > 0.95, cos
    # masters stayed full precision under mixed precision
    for leaf in jax.tree.leaves(results["bf16"][0]):
        assert np.asarray(leaf).dtype in (np.float32, np.float64)


def test_bf16_sgan_trainer_smoke(data_tree):
    from trajnetplusplusbaselines_tpu.trainers import sgan as sgan_trainer

    sgan_trainer.main(argv=[
        "--epochs", "1", "--path", "synthset", "--type", "vanilla",
        "--batch_size", "2", "--save_every", "1", "-o", "bf16",
        "--k", "2", "--bf16",
    ])
    out = "OUTPUT_BLOCK/synthset/sgan_vanilla_bf16.pkl"
    assert os.path.exists(out)
    from trajnetplusplusbaselines_tpu.utils.checkpoint import load_predictor

    predictor = load_predictor(out)
    assert predictor.model.generator.compute_dtype is None
    assert predictor.model.discriminator.compute_dtype is None
    leaf = jax.tree.leaves(predictor.params)[0]
    assert np.asarray(leaf).dtype in (np.float32, np.float64)


def test_bf16_vae_trainer_smoke(data_tree):
    from trajnetplusplusbaselines_tpu.trainers import vae as vae_trainer

    vae_trainer.main(argv=[
        "--epochs", "1", "--path", "synthset", "--type", "vanilla",
        "--batch_size", "2", "--save_every", "1", "-o", "bf16",
        "--k", "2", "--bf16",
    ])
    out = "OUTPUT_BLOCK/synthset/vae_vanilla_bf16.pkl"
    assert os.path.exists(out)
    from trajnetplusplusbaselines_tpu.utils.checkpoint import load_predictor

    predictor = load_predictor(out)
    assert predictor.model.compute_dtype is None
