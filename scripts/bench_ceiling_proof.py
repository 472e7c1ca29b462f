#!/usr/bin/env python
"""Rollout ceiling proof (VERDICT r4 #4): measure the upper bound.

"The binding constraint is per-step serialization + pool-side VPU work" was
an inference; this measures it.  Two bounds, same 20-step autoregressive
scan, same shapes, same bf16/unroll-6 configuration as bench.py's
production row:

- nopool: the vanilla LSTM rollout (input-embedding, gate and head matmuls
  only — pooling deleted).  This is everything the serial scan chain can do
  with its matmuls alone: the hard upper bound for any pooled variant.
- prod:   the production D-LSTM rollout (directional grid pooling).

If prod is within ~1.3x of nopool, the remaining gap to the MXU peak is
the serial-scan structure itself, not unclaimed pool-side headroom.

Writes one JSON line per row to stdout and docs/ceiling_proof_r5.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 197e12


def vanilla_cost_model(a, s, d=2, h=128, e=64, steps=20, dtype_bytes=2):
    """Matmul flops per agent-step for the pool-free LSTM rollout."""
    matmul_flops = 2 * (2 * e + e * 4 * h + h * 4 * h + h * 5)
    return steps * a * matmul_flops


def measure(pool_type, a, s, iters=5):
    import jax
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    pool = None
    if pool_type == "directional":
        pool = GridBasedPooling(
            type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
        )
    dtype = jnp.bfloat16
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128).with_dtype(dtype)
    model.scan_unroll = 6
    params = jax.tree.map(
        lambda x: x.astype(dtype), model.init_params(jax.random.PRNGKey(0))
    )

    t = 21
    rng = np.random.default_rng(0)
    xy = (rng.normal(size=(t, s, a, 2)).cumsum(axis=0) * 0.3).astype(dtype)
    mask = np.ones((t, s, a), bool)
    goals = np.zeros((s, a, 2), dtype)
    slot = np.ones((s, a), bool)

    @jax.jit
    def rollout(params, xy, mask, goals, slot):
        rel, pred, valid = model.forward(
            params, xy[:9], mask[:9], goals, slot, n_predict=12
        )
        return jnp.sum(pred.astype(jnp.float32))

    args = (params, jnp.asarray(xy), jnp.asarray(mask),
            jnp.asarray(goals), jnp.asarray(slot))
    float(rollout(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        float(rollout(*args))
    dt = time.perf_counter() - t0

    scenes_per_sec = s * iters / dt
    if pool_type == "directional":
        import bench

        flops_scene, _ = bench.dlstm_cost_model(a, s, dtype_bytes=2)
    else:
        flops_scene = vanilla_cost_model(a, s)
    mfu = 100.0 * scenes_per_sec * flops_scene / V5E_PEAK_BF16
    return {
        "variant": pool_type or "nopool",
        "A": a,
        "S": s,
        "scenes_per_sec": round(scenes_per_sec, 1),
        "agent_steps_per_sec": round(scenes_per_sec * a * 20, 1),
        "mfu_pct": round(mfu, 2),
    }


def main():
    rows = []
    for a, s in ((8, 131072), (32, 32768)):
        for pool_type in (None, "directional"):
            row = measure(pool_type, a, s)
            rows.append(row)
            print(json.dumps(row), flush=True)
    prod8 = next(r for r in rows if r["variant"] == "directional" and r["A"] == 8)
    nopool8 = next(r for r in rows if r["variant"] == "nopool" and r["A"] == 8)
    ratio = nopool8["scenes_per_sec"] / prod8["scenes_per_sec"]
    print(json.dumps({"bound_ratio_a8": round(ratio, 3)}), flush=True)
    os.makedirs("docs", exist_ok=True)
    with open("docs/ceiling_proof_r5.jsonl", "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps({"bound_ratio_a8": round(ratio, 3)}) + "\n")


if __name__ == "__main__":
    main()
