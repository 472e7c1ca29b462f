"""Bench the fused Pallas D-LSTM step against the XLA rollout path (real TPU).

Scans 20 fused steps (the rollout's step count) over synthetic chains and
reports scenes/sec, next to the XLA full-rollout numbers from
scripts/bench_grid_scatter.py at the same (A, S).  The round-2 kernel
couldn't compile past A=8 on the real Mosaic toolchain (fully unrolled A^2
pair loop); the round-3 kernel rolls agents into a grid dimension + fori
loop, so this is the crossover measurement VERDICT round-2 #6 asked for.

Usage: python scripts/bench_pallas_fused.py [--agents 8 32] [--interpret]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(a, s, iters=5):
    import jax
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pallas.fused_step import (
        fused_dlstm_step,
        weights_from_params,
    )
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    pool = GridBasedPooling(
        type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
    )
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), model.init_params(jax.random.PRNGKey(0))
    )
    weights = weights_from_params(params)

    t = 21
    rng = np.random.default_rng(0)
    obs = jnp.asarray(
        (rng.normal(size=(t, a, s, 2)).cumsum(axis=0) * 0.3).astype(np.float32)
    )
    present = jnp.ones((a, s), jnp.float32)
    h0 = jnp.zeros((a, s, 128), jnp.float32)
    c0 = jnp.zeros((a, s, 128), jnp.float32)

    @jax.jit
    def rollout(h, c, obs):
        def body(carry, inp):
            h, c = carry
            o1, o2 = inp
            h, c, normal, mask = fused_dlstm_step(
                o1, o2, present, present, h, c, weights,
                a=a, hidden=128, emb_dim=64, pool_dim=256, n=12,
                cell_side=0.6, constant=0.0, scene_block=128,
            )
            return (h, c), jnp.sum(normal)
        (h, c), out = jax.lax.scan(body, (h, c), (obs[:-1], obs[1:]))
        return jnp.sum(out)

    t0 = time.perf_counter()
    float(rollout(h0, c0, obs))  # compile + warm
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        float(rollout(h0, c0, obs))
    dt = time.perf_counter() - t0
    return s * iters / dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, nargs="*", default=[8, 32])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    for a in args.agents:
        s = max(256, 65536 // a)
        try:
            sps, compile_s = bench(a, s, args.iters)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"a": a, "s": s, "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        print(
            json.dumps({"a": a, "s": s, "fused_scenes_per_sec": round(sps, 1),
                        "compile_s": round(compile_s, 1)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
