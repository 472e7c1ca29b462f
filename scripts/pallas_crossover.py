"""Measure the fused-Pallas vs XLA rollout crossover over agent count.

docs/SCALING.md predicted the fused kernel (grid resident in VMEM) overtakes
the XLA path (grid materialized in HBM) as A grows; this measures both paths
at A in {8, 16, 32} on the real chip and prints one JSON line per
configuration.  Usage: python scripts/pallas_crossover.py [A ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.ops.pallas.rollout import fused_rollout
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling


def measure(fn, args, s, iters=5):
    out = fn(*args)
    float(jnp.sum(out[1].astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(out[1].astype(jnp.float32)))
    return s * iters / (time.perf_counter() - t0)


def main(agent_counts):
    for a in agent_counts:
        # keep total interaction work roughly constant: S ~ 1/A^2
        s = max(2048, (8 * 65536) // (a * a) // 128 * 128)
        pool = GridBasedPooling(
            type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
        )
        model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32),
            model.init_params(jax.random.PRNGKey(0)),
        )
        rng = np.random.default_rng(0)
        xy = (rng.normal(size=(9, s, a, 2)).cumsum(axis=0) * 0.3).astype(np.float32)
        mask = np.ones((9, s, a), bool)
        goals = np.zeros((s, a, 2), np.float32)
        slot = np.ones((s, a), bool)

        xla_fn = jax.jit(
            lambda p, o, m, g, sl: model.forward(p, o, m, g, sl, n_predict=12)
        )
        xla = measure(
            xla_fn,
            (params, jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(goals),
             jnp.asarray(slot)),
            s,
        )

        try:
            t_compile = time.time()
            fused_fn = lambda p, o, m: fused_rollout(p, o, m, n_predict=12, a=a)
            fused = measure(fused_fn, (params, jnp.asarray(xy), jnp.asarray(mask)), s)
            compile_s = round(time.time() - t_compile, 1)
            err = None
        except Exception as e:  # noqa: BLE001
            fused, compile_s, err = None, None, f"{type(e).__name__}: {e}"[:160]

        print(json.dumps({
            "A": a, "S": s,
            "xla_scenes_per_sec": round(xla, 0),
            "pallas_scenes_per_sec": round(fused, 0) if fused else None,
            "pallas_compile_s": compile_s,
            "pallas_error": err,
        }), flush=True)


if __name__ == "__main__":
    counts = [int(x) for x in sys.argv[1:]] or [8, 16, 32]
    main(counts)
