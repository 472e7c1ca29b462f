"""Probe: do N independent rollout chains in one program beat one big batch?

The rollout ceiling proof (scripts/bench_ceiling_proof.py, RESULTS.md) pinned
the production D-LSTM rollout 1.61x below its no-pool bound and blamed the
20-step serial chain.  This probe measures the one scheduling lever left:
split the scene batch into G independent groups inside one jit so XLA's
latency-hiding scheduler can overlap group i's VPU pooling with group j's
MXU gate matmuls (the chains share no data).  Round-5 result on the v5e:
1/2/4 groups -> 367.3k / 374.8k / 377.5k scenes/s (+2.8% at G=4) — a real
but small recovery, confirming the bound is the serial dependency chain
itself, not scheduler serialization across independent work.  bench.py
adopts G=4; docs/pipeline_probe_r5.json holds the capture.
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

dtype = jnp.bfloat16
pool = GridBasedPooling(type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256)
model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128).with_dtype(dtype)
model.scan_unroll = 6
params = jax.tree.map(lambda x: x.astype(dtype), model.init_params(jax.random.PRNGKey(0)))
t, s, a = 21, 131072, 8
rng = np.random.default_rng(0)
xy = (rng.normal(size=(t, s, a, 2)).cumsum(axis=0) * 0.3).astype(dtype)
mask = np.ones((t, s, a), bool); goals = np.zeros((s, a, 2), dtype); slot = np.ones((s, a), bool)

def mk_args(lo, hi):
    return (jnp.asarray(xy[:, lo:hi]), jnp.asarray(mask[:, lo:hi]),
            jnp.asarray(goals[lo:hi]), jnp.asarray(slot[lo:hi]))

params_d = jax.device_put(params)

@jax.jit
def rollout_one(params, xy, mask, goals, slot):
    rel, pred, valid = model.forward(params, xy[:9], mask[:9], goals, slot, n_predict=12)
    return jnp.sum(pred.astype(jnp.float32))

@jax.jit
def rollout_two(params, a1, a2):
    r1 = model.forward(params, a1[0][:9], a1[1][:9], a1[2], a1[3], n_predict=12)[1]
    r2 = model.forward(params, a2[0][:9], a2[1][:9], a2[2], a2[3], n_predict=12)[1]
    return jnp.sum(r1.astype(jnp.float32)) + jnp.sum(r2.astype(jnp.float32))

full = mk_args(0, s)
h1, h2 = mk_args(0, s // 2), mk_args(s // 2, s)

float(rollout_one(params_d, *full))
t0 = time.perf_counter()
for _ in range(3): float(rollout_one(params_d, *full))
dt = time.perf_counter() - t0
print(json.dumps({"variant": "single", "scenes_per_sec": round(s * 3 / dt, 1)}), flush=True)

float(rollout_two(params_d, h1, h2))
t0 = time.perf_counter()
for _ in range(3): float(rollout_two(params_d, h1, h2))
dt = time.perf_counter() - t0
print(json.dumps({"variant": "two_group", "scenes_per_sec": round(s * 3 / dt, 1)}), flush=True)

# 4-group variant
qs = [mk_args(i * s // 4, (i + 1) * s // 4) for i in range(4)]
@jax.jit
def rollout_four(params, q0, q1, q2, q3):
    tot = jnp.float32(0)
    for q in (q0, q1, q2, q3):
        r = model.forward(params, q[0][:9], q[1][:9], q[2], q[3], n_predict=12)[1]
        tot = tot + jnp.sum(r.astype(jnp.float32))
    return tot
float(rollout_four(params_d, *qs))
t0 = time.perf_counter()
for _ in range(3): float(rollout_four(params_d, *qs))
dt = time.perf_counter() - t0
print(json.dumps({"variant": "four_group", "scenes_per_sec": round(s * 3 / dt, 1)}), flush=True)
