"""Roofline sweep: D-LSTM rollout MFU / HBM utilization over A and dtype.

Prints one JSON line per (A, dtype) config with scenes/sec, achieved
TFLOP/s, % of v5e peak (MFU), and the modeled HBM-traffic ceiling —
using bench.py's analytic cost model (VERDICT round-2 #5).

Usage: python scripts/bench_roofline.py [--agents 8 32 128] [--dtypes bfloat16 float32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import V5E_HBM_BYTES_PER_SEC, V5E_PEAK_FLOPS, dlstm_cost_model  # noqa: E402


def bench_rollout(a, s, dtype_name, iters=5):
    import jax
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    pool = GridBasedPooling(
        type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
    )
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128).with_dtype(dtype)
    params = jax.tree.map(
        lambda x: x.astype(dtype), model.init_params(jax.random.PRNGKey(0))
    )

    t = 21
    rng = np.random.default_rng(0)
    xy = (rng.normal(size=(t, s, a, 2)).cumsum(axis=0) * 0.3).astype(np.float32)
    mask = np.ones((t, s, a), bool)
    goals = np.zeros((s, a, 2), np.float32)
    slot = np.ones((s, a), bool)

    @jax.jit
    def rollout(params, xy, mask, goals, slot):
        rel, pred, valid = model.forward(
            params, xy[:9].astype(dtype), mask[:9], goals.astype(dtype), slot,
            n_predict=12,
        )
        return jnp.sum(pred.astype(jnp.float32))

    args = (
        params,
        jnp.asarray(xy),
        jnp.asarray(mask),
        jnp.asarray(goals),
        jnp.asarray(slot),
    )
    float(rollout(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(rollout(*args))
    return s * iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, nargs="*", default=[8, 32, 128])
    ap.add_argument("--dtypes", nargs="*", default=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    for a in args.agents:
        s = max(256, 65536 // a)
        for dtype in args.dtypes:
            try:
                sps = bench_rollout(a, s, dtype, args.iters)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"a": a, "dtype": dtype, "error": str(e)[:200]}),
                      flush=True)
                continue
            dbytes = 2 if dtype == "bfloat16" else 4
            flops_scene, bytes_scene = dlstm_cost_model(a, s, dtype_bytes=dbytes)
            achieved = sps * flops_scene
            print(
                json.dumps(
                    {
                        "a": a,
                        "s": s,
                        "dtype": dtype,
                        "scenes_per_sec": round(sps, 1),
                        "achieved_tflops": round(achieved / 1e12, 3),
                        "mfu_pct": round(100 * achieved / V5E_PEAK_FLOPS[dtype], 2),
                        "hbm_ceiling_pct": round(
                            100 * sps * bytes_scene / V5E_HBM_BYTES_PER_SEC, 1
                        ),
                        "arith_intensity_flops_per_byte": round(
                            flops_scene / bytes_scene, 1
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
