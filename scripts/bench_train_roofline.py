"""Training roofline sweep (VERDICT r3 #5): A x dtype + ensemble aggregate.

Measures the PRODUCTION resident-epoch training path (batch=8 sequential SGD,
directional pooling, on-device rotation augmentation) at A in {8, 32} and
f32/bf16 compute, reporting measured scenes/s next to the analytic
fwd+bwd+Adam cost model (bench.py dlstm_train_cost_model) as TFLOP/s, MFU,
and the un-fused HBM-ceiling fraction.  Also measures the 5-member vmapped
ensemble trainer's AGGREGATE trained-scenes/s at the protocol shape (A=8,
f32) — the multi-model training headline: five sequential-SGD chains batch
across the member axis, the one axis the per-step serialization does not
bind.

Writes one JSON line per row to stdout and docs/train_roofline_r4.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import V5E_PEAK_FLOPS, V5E_HBM_BYTES_PER_SEC, dlstm_train_cost_model
from trajnetplusplusbaselines_tpu.losses import prediction_loss
from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling
from trajnetplusplusbaselines_tpu.trainers import common as C

C.enable_compilation_cache()
OBS, PRED, SEQ, BATCH = 9, 12, 21, 8


def make_step(model, optimizer, compute_dtype):
    def loss_fn(params, xy, mask, goals, slot, scene):
        params = C.cast_compute(params, compute_dtype)
        rel, _, _ = model.forward(
            params, xy[:OBS], mask[:OBS], goals, slot,
            prediction_truth=xy[OBS:SEQ - 1], prediction_truth_mask=mask[OBS:SEQ - 1],
        )
        rel = C.outputs_f32(rel, compute_dtype)
        targets = xy[OBS:SEQ, :, 0] - xy[OBS - 1:SEQ - 1, :, 0]
        return prediction_loss(rel[-PRED:, :, 0], targets, scene) * BATCH

    def step_core(carry, xy, mask, goals, slot, scene, key):
        del key
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, xy, mask, goals, slot, scene)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state), loss

    return step_core


def resident_arrays(n_scenes, a, seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray((rng.normal(size=(n_scenes, SEQ, a, 2)).cumsum(axis=1) * 0.3)
                     .astype(np.float32))
    mask = jnp.ones((n_scenes, SEQ, a), bool)
    goals = jnp.zeros((n_scenes, a, 2), jnp.float32)
    num_agents = jnp.full((n_scenes,), a, jnp.int32)
    idx = jnp.asarray(rng.permutation(n_scenes).reshape(-1, BATCH).astype(np.int32))
    valid = jnp.ones(idx.shape, bool)
    return xs, mask, goals, num_agents, idx, valid


def fresh(compute_dtype, a):
    pool = GridBasedPooling(type_="directional", hidden_dim=128, cell_side=0.6,
                            n=12, out_dim=256)
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    if compute_dtype is not None:
        model.with_dtype(compute_dtype)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                          model.init_params(jax.random.PRNGKey(0)))
    optimizer = C.make_optimizer()
    return model, optimizer, params, optimizer.init(params)


def bench_train(a, compute_dtype, n_scenes, iters=5):
    model, optimizer, params, opt_state = fresh(compute_dtype, a)
    runner = C.make_bucket_epoch_runner(make_step(model, optimizer, compute_dtype),
                                        augment=True)
    arrays = resident_arrays(n_scenes, a)

    def run(carry, key):
        carry, losses = runner(carry, *arrays, key)
        float(jnp.sum(losses))  # tunnel-reliable sync
        return carry

    carry = run((params, opt_state), jax.random.PRNGKey(0))  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        carry = run(carry, jax.random.PRNGKey(i + 1))
    dt = time.perf_counter() - t0
    return n_scenes * iters / dt


def bench_ensemble(a, n_scenes, members=5, iters=5):
    model, optimizer, params, _ = fresh(None, a)
    stacked = jax.vmap(model.init_params)(
        jnp.stack([jax.random.PRNGKey(s) for s in range(members)])
    )
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), stacked)
    opt_state = jax.vmap(optimizer.init)(stacked)
    runner = C.make_bucket_epoch_runner(make_step(model, optimizer, None),
                                        augment=True, ensemble=True)
    xs, mask, goals, num_agents, idx, valid = resident_arrays(n_scenes, a)
    idxs = jnp.stack([idx] * members)
    valids = jnp.stack([valid] * members)
    keys = jnp.stack([jax.random.PRNGKey(s + 1) for s in range(members)])

    def run(carry):
        carry, losses = runner(carry, xs, mask, goals, num_agents, idxs, valids, keys)
        float(jnp.sum(losses))
        return carry

    carry = run((stacked, opt_state))
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = run(carry)
    dt = time.perf_counter() - t0
    return members * n_scenes * iters / dt


def main():
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "docs", "train_roofline_r4.jsonl")
    rows = []
    for a, n_scenes in ((8, 4096), (32, 1024)):
        for name, dt, key in (("float32", None, "float32"),
                              ("bfloat16", jnp.bfloat16, "bfloat16")):
            sps = bench_train(a, dt, n_scenes)
            dtype_bytes = 2 if dt is not None else 4
            flops, bytes_ = dlstm_train_cost_model(a, BATCH, dtype_bytes=dtype_bytes)
            tflops = sps * flops / 1e12
            row = {
                "kind": "train", "A": a, "dtype": name,
                "scenes_per_sec": round(sps, 1),
                "tflops": round(tflops, 2),
                "mfu_pct": round(100 * tflops * 1e12 / V5E_PEAK_FLOPS[key], 2),
                "hbm_ceiling_pct": round(100 * sps * bytes_ / V5E_HBM_BYTES_PER_SEC, 2),
                "flops_per_byte": round(flops / bytes_, 1),
            }
            rows.append(row)
            print(json.dumps(row)); sys.stdout.flush()

    agg = bench_ensemble(8, 4096)
    flops, _ = dlstm_train_cost_model(8, BATCH, dtype_bytes=4)
    row = {
        "kind": "train-ensemble", "A": 8, "dtype": "float32", "members": 5,
        "aggregate_scenes_per_sec": round(agg, 1),
        "tflops": round(agg * flops / 1e12, 2),
        "mfu_pct": round(100 * agg * flops / V5E_PEAK_FLOPS["float32"], 2),
    }
    rows.append(row)
    print(json.dumps(row)); sys.stdout.flush()

    with open(out_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
