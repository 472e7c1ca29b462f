"""Measure the XLA vs fused-Pallas rollout crossover in agent count.

VERDICT round-1 #4: the fused kernel (ops/pallas/fused_step.py) loses at the
benchmark shape A=8; its claimed advantage is the VMEM-resident interaction
grid whose XLA counterpart materializes [S, A, G, D] in HBM — quadratic in A.
This script measures both paths at A in {8, 16, 32, 64} with a fixed total
agent budget (S*A const) and prints one JSON line per configuration so the
crossover (if any) lands in RESULTS.md as data, not a claim.

Run on the real TPU: python scripts/bench_fused_crossover.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=262144,
                    help="total agents per batch (S*A held constant)")
    ap.add_argument("--agents", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="debug on CPU (fused path runs in interpret mode)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pallas.rollout import fused_rollout
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    pool = GridBasedPooling(type_="directional", hidden_dim=128, cell_side=0.6,
                            n=12, out_dim=256)
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                          model.init_params(jax.random.PRNGKey(0)))

    rows = []
    for a in args.agents:
        s = max(128, args.budget // a)
        rng = np.random.default_rng(0)
        xy = jnp.asarray((rng.normal(size=(9, s, a, 2)).cumsum(axis=0) * 0.3
                          ).astype(np.float32))
        mask = jnp.ones((9, s, a), bool)
        goals = jnp.zeros((s, a, 2), jnp.float32)
        slot = jnp.ones((s, a), bool)

        @jax.jit
        def xla_rollout(params, xy, mask, goals, slot):
            _, pred, _ = model.forward(params, xy, mask, goals, slot,
                                       n_predict=12)
            return jnp.sum(pred)

        def timed(fn, *fargs):
            float(fn(*fargs))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(fn(*fargs))
            return s * args.iters / (time.perf_counter() - t0)

        xla_sps = timed(xla_rollout, params, xy, mask, goals, slot)

        fused = jax.jit(lambda p, o, m: jnp.sum(
            fused_rollout(p, o, m, n_predict=12, a=a)[1]))
        try:
            if args.cpu:
                from jax.experimental.pallas import tpu as pltpu

                with pltpu.force_tpu_interpret_mode():
                    fused_sps = timed(fused, params, xy, mask)
            else:
                fused_sps = timed(fused, params, xy, mask)
        except Exception as e:  # noqa: BLE001
            fused_sps = float("nan")
            print(f"# fused failed at A={a}: {type(e).__name__}: {e}")

        row = {"A": a, "S": s, "xla_scenes_per_sec": round(xla_sps, 1),
               "fused_scenes_per_sec": round(fused_sps, 1),
               "fused_over_xla": round(fused_sps / xla_sps, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["fused_over_xla"])
    print(f"# max fused/xla ratio {best['fused_over_xla']} at A={best['A']}")


if __name__ == "__main__":
    main()
