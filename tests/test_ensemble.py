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


def test_autosplit_helpers():
    """Member-split fallback arithmetic (VERDICT r4 #3)."""
    from trajnetplusplusbaselines_tpu.trainers import ensemble as ens

    assert ens.split_members([10, 20, 30, 40, 42]) == [[10, 20, 30], [40, 42]]
    assert ens.split_members([1, 2]) == [[1], [2]]
    with pytest.raises(ValueError):
        ens.split_members([1])

    argv = ["--epochs", "2", "--seeds", "10", "20", "30", "--type", "nmmp"]
    out = ens.argv_with_seeds(argv, [40, 42])
    assert out == ["--epochs", "2", "--type", "nmmp", "--seeds", "40", "42"]
    # no --seeds group present: appended
    assert ens.argv_with_seeds(["--epochs", "1"], [7]) == \
        ["--epochs", "1", "--seeds", "7"]

    assert ens.is_resource_failure(
        RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in memory space hbm"))
    assert ens.is_resource_failure(
        RuntimeError("TPU worker process crashed or restarted"))
    assert not ens.is_resource_failure(ValueError("bad flag"))


def test_ensemble_rejects_tp(data_tree):
    """--tp must error loudly: the stacked [E, ...] member layout has no
    model-parallel sharding rule (VERDICT r4 #8)."""
    from trajnetplusplusbaselines_tpu.trainers import ensemble as ens

    argv = ["--epochs", "1", "--path", "synthset", "--type", "occupancy",
            "--seeds", "7", "11", "--tp", "2"]
    with pytest.raises(SystemExit, match="--dp only"):
        ens.main(argv=argv)


def test_autosplit_retrains_member_chunks(data_tree, monkeypatch):
    """On an OOM/worker-crash resource failure, the ensemble trainer splits
    the member axis and retrains each chunk in a fresh subprocess with the
    same argv (minus the failed --seeds group); non-resource failures and
    --no_autosplit propagate unchanged (VERDICT r4 #3)."""
    from trajnetplusplusbaselines_tpu.trainers import ensemble as ens

    def boom(self, *a, **k):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Ran out of memory in memory space hbm: "
            "16.02G of 15.75G")

    monkeypatch.setattr(ens.EnsembleTrainer, "loop", boom)

    calls = []

    def fake_call(cmd):
        assert cmd[:3] == [ens.sys.executable, "-m",
                           "trajnetplusplusbaselines_tpu.trainers.ensemble"]
        calls.append(cmd[3:])
        return 0

    monkeypatch.setattr(ens.subprocess, "call", fake_call)

    argv = ["--epochs", "1", "--path", "synthset", "--type", "occupancy",
            "--n", "4", "--batch_size", "2", "--seeds", "10", "20", "30"]
    ens.main(argv=argv)

    assert [c[c.index("--seeds") + 1:] for c in calls] == \
        [["10", "20"], ["30"]]
    # everything but the --seeds group is preserved verbatim
    for c in calls:
        assert c[:c.index("--seeds")] == argv[:argv.index("--seeds")]

    # chunk subprocess failure surfaces as SystemExit, not silence
    monkeypatch.setattr(ens.subprocess, "call", lambda cmd: 3)
    with pytest.raises(SystemExit, match="rc=3"):
        ens.main(argv=argv)

    # --no_autosplit and non-resource failures propagate
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        ens.main(argv=argv + ["--no_autosplit"])

    def bad_flag(self, *a, **k):
        raise ValueError("not a resource problem")

    monkeypatch.setattr(ens.EnsembleTrainer, "loop", bad_flag)
    with pytest.raises(ValueError, match="not a resource"):
        ens.main(argv=argv)


def test_sgan_resident_flags_update_correct_player(data_tree):
    """In the fused g/d scan step, a g-flagged batch must leave the
    discriminator untouched and vice versa (lax.cond branch selection)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trajnetplusplusbaselines_tpu.trainers import sgan as sgan_trainer

    # build a tiny trainer via main()'s wiring but stop before loop
    import argparse
    from trajnetplusplusbaselines_tpu.models.sgan import (
        SGAN, LSTMDiscriminator, LSTMGenerator,
    )
    from trajnetplusplusbaselines_tpu.trainers.common import make_optimizer, step_lr

    gen = LSTMGenerator(embedding_dim=8, hidden_dim=16, pool=None, noise_dim=4)
    disc = LSTMDiscriminator(embedding_dim=8, hidden_dim=16, pool=None)
    model = SGAN(gen, disc, k=2, d_steps=1, g_steps=1)
    params = model.init_params(jax.random.PRNGKey(0))
    t = sgan_trainer.Trainer(
        model, params, make_optimizer(), make_optimizer(),
        step_lr(1e-3, 10), step_lr(1e-3, 10), batch_size=2,
    )
    step_core = t._train_step_core()

    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.normal(size=(21, 2, 3, 2)).cumsum(axis=0))
    mask = jnp.ones((21, 2, 3), bool)
    goals = jnp.zeros((2, 3, 2))
    slot = jnp.ones((2, 3), bool)
    scene = jnp.ones(2, bool)
    key = jax.random.PRNGKey(1)

    carry0 = (params["generator"], params["discriminator"],
              t.g_opt_state, t.d_opt_state)

    (g1, d1, _, _), _ = step_core(carry0, xy, mask, goals, slot, scene, key,
                                  jnp.asarray(1))
    assert not all(
        np.allclose(a, b) for a, b in
        zip(jax.tree.leaves(g1), jax.tree.leaves(params["generator"]))
    ), "g step did not update the generator"
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        d1, params["discriminator"],
    )

    (g2, d2, _, _), _ = step_core(carry0, xy, mask, goals, slot, scene, key,
                                  jnp.asarray(0))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g2, params["generator"],
    )
    assert not all(
        np.allclose(a, b) for a, b in
        zip(jax.tree.leaves(d2), jax.tree.leaves(params["discriminator"]))
    ), "d step did not update the discriminator"
