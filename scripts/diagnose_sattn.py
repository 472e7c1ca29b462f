"""Instrument the S-Attn (attentionmlp) training instability (VERDICT r2 #4).

Trains attentionmlp at chosen lr/seed while recording per-batch diagnostics
from inside the resident-epoch scan: loss, global grad norm, the minimum
predicted sigma (the Gaussian head's 0.01 floor is the suspected overconfidence
mechanism), the share of primary predictions with sub-sigma error, and the
parameter/update norms.  Writes one JSON line per epoch with the extrema.

Usage: python scripts/diagnose_sattn.py --seed 30 --lr 1e-3 --epochs 12
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--path", default="trajdata_split")
    ap.add_argument("--out", default=None, help="JSONL output path")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax

    from trajnetplusplusbaselines_tpu.data.load import prepare_data
    from trajnetplusplusbaselines_tpu.losses import prediction_loss
    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import AttentionMLPPooling
    from trajnetplusplusbaselines_tpu.trainers.common import (
        ResidentDataset,
        SceneDataset,
        enable_compilation_cache,
        make_bucket_epoch_runner,
        make_optimizer,
        set_lr,
        step_lr,
    )

    enable_compilation_cache()
    obs, pred, seq, batch = 9, 12, 21, 8

    pool = AttentionMLPPooling(hidden_dim=128, mlp_dim_spatial=32, mlp_dim_vel=32,
                               out_dim=256)
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        model.init_params(jax.random.PRNGKey(args.seed)),
    )
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    schedule = step_lr(args.lr, 10)

    def loss_fn(p, xy, mask, goals, slot, scene):
        rel, pr, valid = model.forward(
            p, xy[:obs], mask[:obs], goals, slot,
            prediction_truth=xy[obs : seq - 1],
            prediction_truth_mask=mask[obs : seq - 1],
        )
        primary = rel[-pred:, :, 0]  # [T', S, 5]
        targets = xy[obs:seq, :, 0] - xy[obs - 1 : seq - 1, :, 0]
        loss = prediction_loss(primary, targets, scene) * batch
        sigma = primary[..., 2:4]
        err = jnp.linalg.norm(primary[..., :2] - targets, axis=-1)  # [T', S]
        sig_scale = jnp.mean(sigma, axis=-1)
        live = scene[None, :]
        sigma_min = jnp.min(jnp.where(live[..., None], sigma, 1e9))
        subsigma = jnp.sum((err < sig_scale) & live) / jnp.maximum(jnp.sum(live), 1)
        return loss, (sigma_min, subsigma)

    # fixed order of top-level param subtrees for the per-layer norm trace
    subtree_keys = sorted(params.keys())
    # per-leaf pool gradient norms: which attention weight actually blows up
    pool_leaf_keys = sorted(params["pool"].keys())

    def step_core(carry, xy, mask, goals, slot, scene, key):
        del key
        p, s = carry
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, xy, mask, goals, slot, scene
        )
        gnorm = optax.global_norm(grads)
        layer_norms = jnp.stack(
            [optax.global_norm(grads[k]) for k in subtree_keys]
        )
        pool_norms = jnp.stack(
            [optax.global_norm(grads["pool"][k]) for k in pool_leaf_keys]
        )
        # input-data magnitudes for this batch: are the spikes data outliers?
        pair_ok = (mask[:, :, None, :] & mask[:, :, :, None])[..., None]
        relmax = jnp.max(
            jnp.where(pair_ok,
                      jnp.abs(xy[:, :, None, :, :] - xy[:, :, :, None, :]), 0.0)
        )
        vel_ok = (mask[1:] & mask[:-1])[..., None]
        velmax = jnp.max(jnp.where(vel_ok, jnp.abs(xy[1:] - xy[:-1]), 0.0))
        updates, s = optimizer.update(grads, s, p)
        unorm = optax.global_norm(updates)
        p = jax.tree.map(lambda a, b: a + b, p, updates)
        pnorm = optax.global_norm(p)
        return (p, s), jnp.concatenate(
            [jnp.stack([loss, gnorm, aux[0], aux[1], pnorm, relmax, velmax,
                        unorm]),
             layer_norms, pool_norms]
        )

    runner = make_bucket_epoch_runner(step_core, augment=True)

    data_path = os.path.join("DATA_BLOCK", args.path)
    scenes, goals_d, _ = prepare_data(data_path, subset="/train/", sample=1.0, goals=False)
    ds = SceneDataset(scenes, goals_d, obs, False)
    resident = ResidentDataset(ds)

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed + 1)
    out_path = args.out or f"sattn_diag_seed{args.seed}_lr{args.lr}.jsonl"
    fout = open(out_path, "a")

    carry = (params, opt_state)
    for epoch in range(args.epochs):
        opt_state = set_lr(carry[1], float(schedule(epoch)))
        carry = (carry[0], opt_state)
        plan = resident.epoch_plan(batch, rng)
        stats = []
        for bkey, (idx, valid) in plan.items():
            data = resident.buckets[bkey]
            key, sub = jax.random.split(key)
            carry, out = runner(
                carry, data["xs"], data["mask"], data["goals"],
                data["num_agents"], jnp.asarray(idx), jnp.asarray(valid), sub,
            )
            stats.append(np.asarray(out))  # [nb, 5]
        st = np.concatenate(stats)
        worst = int(np.argmax(st[:, 1]))
        base = 8 + len(subtree_keys)
        rec = {
            "epoch": epoch,
            "lr": float(schedule(epoch)),
            "loss_mean": round(float(np.mean(st[:, 0])), 3),
            "loss_max": round(float(np.max(st[:, 0])), 3),
            "gnorm_p50": round(float(np.percentile(st[:, 1], 50)), 1),
            "gnorm_p99": round(float(np.percentile(st[:, 1], 99)), 1),
            "gnorm_max": round(float(np.max(st[:, 1])), 1),
            "gnorm_argmax": worst,
            "loss_at_worst": round(float(st[worst, 0]), 3),
            "sigma_min_at_worst": round(float(st[worst, 2]), 5),
            "subsigma_at_worst": round(float(st[worst, 3]), 4),
            "sigma_min_epoch": round(float(np.min(st[:, 2])), 5),
            "subsigma_p50": round(float(np.percentile(st[:, 3], 50)), 4),
            "param_norm_end": round(float(st[-1, 4]), 1),
            "relmax_at_worst": round(float(st[worst, 5]), 2),
            "relmax_p99": round(float(np.percentile(st[:, 5], 99)), 2),
            "velmax_at_worst": round(float(st[worst, 6]), 2),
            "velmax_p99": round(float(np.percentile(st[:, 6], 99)), 2),
            "update_norm_at_worst": round(float(st[worst, 7]), 3),
            "update_norm_p50": round(float(np.percentile(st[:, 7], 50)), 3),
            "layer_gnorms_at_worst": {
                k: round(float(st[worst, 8 + i]), 1)
                for i, k in enumerate(subtree_keys)
            },
            "pool_gnorms_at_worst": {
                k: round(float(st[worst, base + i]), 1)
                for i, k in enumerate(pool_leaf_keys)
            },
            "nonfinite_params": bool(
                any(not np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(carry[0]))
            ),
        }
        print(json.dumps(rec), flush=True)
        fout.write(json.dumps(rec) + "\n")
        fout.flush()
    fout.close()


if __name__ == "__main__":
    main()
