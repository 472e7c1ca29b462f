"""Probe: grouped rollout execution vs one monolithic scene batch.

The round-5 ceiling proof (scripts/bench_ceiling_proof.py, RESULTS.md) pinned
the production D-LSTM rollout 1.61x below a "no-pool bound" measured on one
131k-scene batch and blamed the 20-step serial chain.  This probe re-examines
that premise by splitting the same 131k scenes into G independent groups
inside one jit, two ways:

1. a Python loop over G slices (G copies of the rollout in the HLO — program
   size and compile time grow with G), and
2. ``lax.scan`` over a group-major stack (O(1) program size; ``unroll=2``
   gives the scheduler a window of two data-independent groups to overlap).

Round-5 measurements on the v5e (131072 scenes, A=8, bf16, scan_unroll=6,
docs/pipeline_probe_r5.json):

  python-loop  G=1/2/4:      367.3k / 374.8k / 377.5k scenes/s
  python-loop  G=8/16/32/64: 421.3k / 441.0k / 542.1k / 611.2k
                             (compile 337 s at G=32, 382 s at G=64)
  lax.scan     G=32/64/128/256 (unroll 2): 647.7k / 719.2k / 624.8k / 653.0k
                             (compile 9-115 s; G=64 unroll 1: 715.7k)

Two compounding effects, not one: small groups keep the whole step working
set VMEM-resident (and put the batched observation-phase fold back inside
its ~64k agent-row gate), and group independence lets the scheduler overlap
VPU pool work with MXU matmuls.  The "no-pool bound" itself moves when
measured group-scanned (see bench_ceiling_proof.py) — the old bound was
partly measuring the same HBM-spill penalty.  bench.py adopts the winner
(lax.scan, G=64, unroll=2).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from trajnetplusplusbaselines_tpu.models.lstm import LSTM  # noqa: E402
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling  # noqa: E402

T, S, A = 21, 131072, 8


def make_model():
    dtype = jnp.bfloat16
    pool = GridBasedPooling(
        type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256
    )
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128).with_dtype(dtype)
    model.scan_unroll = 6
    params = jax.device_put(
        jax.tree.map(
            lambda x: x.astype(dtype), model.init_params(jax.random.PRNGKey(0))
        )
    )
    return model, params, dtype


def make_data(dtype):
    rng = np.random.default_rng(0)
    xy = jnp.asarray(
        (rng.normal(size=(T, S, A, 2)).cumsum(axis=0) * 0.3).astype(dtype)
    )
    mask = jnp.asarray(np.ones((T, S, A), bool))
    goals = jnp.asarray(np.zeros((S, A, 2), dtype))
    slot = jnp.asarray(np.ones((S, A), bool))
    return xy, mask, goals, slot


def measure(fn, args, label):
    tc = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - tc
    t0 = time.perf_counter()
    for _ in range(3):
        float(fn(*args))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "variant": label,
                "scenes_per_sec": round(S * 3 / dt, 1),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def loop_rollout(model, groups):
    @jax.jit
    def rollout(params, xy, mask, goals, slot):
        total = jnp.float32(0)
        gs = xy.shape[1] // groups
        for g in range(groups):
            sl = slice(g * gs, (g + 1) * gs)
            _, pred, _ = model.forward(
                params, xy[:9, sl], mask[:9, sl], goals[sl], slot[sl],
                n_predict=12,
            )
            total = total + jnp.sum(pred.astype(jnp.float32))
        return total

    return rollout


def scan_rollout(model, groups, unroll):
    @jax.jit
    def rollout(params, xy, mask, goals, slot):
        gs = xy.shape[1] // groups
        xyg = jnp.moveaxis(xy[:9].reshape(9, groups, gs, A, 2), 1, 0)
        mg = jnp.moveaxis(mask[:9].reshape(9, groups, gs, A), 1, 0)
        gg = goals.reshape(groups, gs, A, 2)
        sg = slot.reshape(groups, gs, A)

        def body(total, xs):
            x, m, g, sl = xs
            _, pred, _ = model.forward(params, x, m, g, sl, n_predict=12)
            return total + jnp.sum(pred.astype(jnp.float32)), None

        total, _ = lax.scan(body, jnp.float32(0), (xyg, mg, gg, sg),
                            unroll=unroll)
        return total

    return rollout


def main():
    model, params, dtype = make_model()
    xy, mask, goals, slot = make_data(dtype)
    args = (params, xy, mask, goals, slot)
    for g in (1, 4):
        measure(loop_rollout(model, g), args, f"loop_g{g}")
    for g in (32, 64, 128):
        measure(scan_rollout(model, g, 2), args, f"scan_g{g}_u2")


if __name__ == "__main__":
    main()
