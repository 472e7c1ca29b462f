"""A-sweep benchmark of the D-LSTM rollout across grid-scatter impls (real TPU).

Measures scenes/sec of the full 9-obs/12-pred directional rollout for each
last-write-wins implementation in ops/pooling/grid._SCATTER_IMPLS at agent
counts 8..128, to pick the per-A default and retire the A=32 cliff
(VERDICT round-2 #1: scatter_max did 908 scenes/s at A=32 vs 42k at A=16).

Usage: python scripts/bench_grid_scatter.py [--agents 8 16 32 64 128]
           [--impls chain argmax_gather ...] [--out grid_sweep.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_rollout(a, s, impl, iters=5):
    import jax
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    pool = GridBasedPooling(
        type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
    )
    pool.scatter_impl = impl
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), model.init_params(jax.random.PRNGKey(0))
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
            params, xy[:9], mask[:9], goals, slot, n_predict=12
        )
        return jnp.sum(pred.astype(jnp.float32))

    args = (
        params,
        jnp.asarray(xy),
        jnp.asarray(mask),
        jnp.asarray(goals),
        jnp.asarray(slot),
    )
    t0 = time.perf_counter()
    float(rollout(*args))  # compile + warm
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        float(rollout(*args))
    dt = time.perf_counter() - t0
    return s * iters / dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, nargs="*", default=[8, 16, 32, 64, 128])
    ap.add_argument(
        "--impls", nargs="*", default=["chain", "scatter_max", "argmax_gather", "argmax_matmul"]
    )
    ap.add_argument("--scenes", type=int, default=None, help="override S for all A")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = []
    for a in args.agents:
        s = args.scenes or max(256, 65536 // a)
        for impl in args.impls:
            if impl == "chain" and a > 16:
                continue  # unrolled-graph compile exceeds 9 min past A=16
            try:
                sps, compile_s = bench_rollout(a, s, impl, args.iters)
            except Exception as e:  # noqa: BLE001 — remote compiler may OOM
                print(f"A={a:4d} S={s:6d} {impl:14s} FAILED: {type(e).__name__}: {e}",
                      flush=True, file=sys.stderr)
                results.append({"a": a, "s": s, "impl": impl, "error": str(e)[:200]})
                continue
            print(
                f"A={a:4d} S={s:6d} {impl:14s} {sps:12,.0f} scenes/s"
                f"  (compile {compile_s:.1f}s)",
                flush=True,
            )
            results.append(
                {"a": a, "s": s, "impl": impl, "scenes_per_sec": round(sps, 1),
                 "compile_s": round(compile_s, 1)}
            )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
