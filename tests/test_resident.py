"""Resident-epoch path equivalence vs the per-batch packed path.

The trainers' fast path keeps scenes resident on device and gathers batches
inside a lax.scan (trainers/common.py); with augmentation off and the same
batch plan it must produce bit-identical losses and parameters to stepping
the packed batches one by one.
"""

import types

import numpy as np
import jax
import jax.numpy as jnp

from trajnetplusplusbaselines_tpu.data import batching
from trajnetplusplusbaselines_tpu.losses import prediction_loss
from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.trainers.common import (
    ResidentDataset,
    make_bucket_epoch_runner,
    make_optimizer,
)

OBS, PRED, SEQ, BATCH = 9, 12, 21, 2


def _dataset(n_scenes=7, seed=0):
    """Duck-typed SceneDataset: NaN-gapped scenes of ragged agent counts."""
    rng = np.random.default_rng(seed)
    ds = types.SimpleNamespace(xys=[], goals=[])
    for i in range(n_scenes):
        a = int(rng.integers(2, 5))
        xy = rng.normal(size=(SEQ, a, 2)).cumsum(axis=0)
        if a > 2:
            xy[: SEQ // 4, 1] = np.nan  # late-appearing track
        ds.xys.append(xy)
        ds.goals.append(np.zeros((a, 2)))
    return ds


def _step_parts(model, optimizer):
    def loss_fn(params, xy, mask, goals, slot, scene):
        rel, _, _ = model.forward(
            params, xy[:OBS], mask[:OBS], goals, slot,
            prediction_truth=xy[OBS : SEQ - 1],
            prediction_truth_mask=mask[OBS : SEQ - 1],
        )
        targets = xy[OBS:SEQ, :, 0] - xy[OBS - 1 : SEQ - 1, :, 0]
        return prediction_loss(rel[-PRED:, :, 0], targets, scene) * BATCH

    def step_core(carry, xy, mask, goals, slot, scene, key):
        del key
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, xy, mask, goals, slot, scene)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state), loss

    return step_core


def test_resident_epoch_matches_packed_steps():
    ds = _dataset()
    model = LSTM(pool=None, embedding_dim=8, hidden_dim=16)
    params0 = model.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    step_core = _step_parts(model, optimizer)

    # host copies: the resident runner donates its carry, which would delete
    # the original buffers the packed path still needs
    params0 = jax.tree.map(lambda x: np.asarray(x).copy(), params0)

    resident = ResidentDataset(ds)
    rng = np.random.default_rng(1)
    plan = resident.epoch_plan(BATCH, rng, shuffle=True)

    # resident path
    runner_losses = []
    carry = (jax.tree.map(jnp.asarray, params0),
             optimizer.init(jax.tree.map(jnp.asarray, params0)))
    for bkey, (idx, valid) in plan.items():
        runner = make_bucket_epoch_runner(step_core)
        data = resident.buckets[bkey]
        carry, losses = runner(
            carry, data["xs"], data["mask"], data["goals"],
            data["num_agents"], jnp.asarray(idx), jnp.asarray(valid),
            jax.random.PRNGKey(2),
        )
        runner_losses.extend(np.asarray(losses).tolist())
    resident_params = carry[0]

    # packed per-batch path over the SAME plan
    carry = (jax.tree.map(jnp.asarray, params0),
             optimizer.init(jax.tree.map(jnp.asarray, params0)))
    packed_losses = []
    for bkey, (idx, valid) in plan.items():
        scene_ids = [i for i, xy in enumerate(ds.xys)
                     if (xy.shape[0], max(batching.agent_bucket(xy.shape[1]), xy.shape[1])) == bkey]
        for row, vrow in zip(idx, valid):
            xs = [ds.xys[scene_ids[j]] for j, v in zip(row, vrow) if v]
            gs = [ds.goals[scene_ids[j]] for j, v in zip(row, vrow) if v]
            packed = batching.pack_scenes(xs, gs, bucket=bkey[1], pad_scenes_to=BATCH)
            slot = np.arange(packed.max_agents)[None] < packed.num_agents[:, None]
            scene = packed.num_agents > 0
            carry, loss = step_core(
                carry, jnp.asarray(packed.xy), jnp.asarray(packed.mask),
                jnp.asarray(packed.goals), jnp.asarray(slot),
                jnp.asarray(scene), None,
            )
            packed_losses.append(float(loss))

    np.testing.assert_allclose(runner_losses, packed_losses, rtol=1e-12)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12),
        resident_params, carry[0],
    )


def test_resident_device_augmentation_statistics():
    """Device-side rotation preserves pairwise distances and goal geometry."""
    ds = _dataset(n_scenes=4, seed=3)
    for i in range(4):
        ds.goals[i] = np.random.default_rng(i).normal(size=ds.goals[i].shape)
    resident = ResidentDataset(ds)

    captured = {}

    def probe(carry, xy, mask, goals, slot, scene, key):
        return carry, (xy, goals)

    runner = make_bucket_epoch_runner(probe, augment=True)
    rng = np.random.default_rng(0)
    plan = resident.epoch_plan(BATCH, rng, shuffle=False)
    for bkey, (idx, valid) in plan.items():
        data = resident.buckets[bkey]
        _, (xy_aug, goals_aug) = runner(
            0, data["xs"], data["mask"], data["goals"], data["num_agents"],
            jnp.asarray(idx), jnp.asarray(valid), jax.random.PRNGKey(5),
        )
        captured[bkey] = (np.asarray(xy_aug), np.asarray(goals_aug), data)

    rotated_any = False
    for bkey, (xy_aug, goals_aug, data) in captured.items():
        xs = np.asarray(data["xs"])
        for b in range(xy_aug.shape[0]):
            for s in range(xy_aug.shape[2]):
                orig_idx = int(np.asarray(plan[bkey][0])[b, s])
                if not np.asarray(plan[bkey][1])[b, s]:
                    continue
                orig = xs[orig_idx]  # [T, A, 2]
                aug = xy_aug[b, :, s]  # [T, A, 2]
                m = np.asarray(data["mask"])[orig_idx]
                # distance from each point to the scene origin is preserved
                np.testing.assert_allclose(
                    np.linalg.norm(aug[m], axis=-1),
                    np.linalg.norm(orig[m], axis=-1),
                    atol=1e-4,
                )
                if not np.allclose(aug[m], orig[m], atol=1e-6):
                    rotated_any = True
    assert rotated_any, "augmentation never rotated anything"
