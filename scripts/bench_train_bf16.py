import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""f32 vs bf16-compute training throughput (resident epoch runner)."""
import json, time
from trajnetplusplusbaselines_tpu.trainers.common import enable_compilation_cache
import numpy as np
import jax, jax.numpy as jnp
from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling
from trajnetplusplusbaselines_tpu.trainers import common as C
from trajnetplusplusbaselines_tpu.losses import prediction_loss

enable_compilation_cache()
obs, pred, seq, batch = 9, 12, 21, 8

def bench(compute_dtype):
    pool = GridBasedPooling(type_="directional", hidden_dim=128, cell_side=0.6, n=12, out_dim=256)
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    if compute_dtype is not None:
        model.with_dtype(compute_dtype)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model.init_params(jax.random.PRNGKey(0)))
    optimizer = C.make_optimizer()
    opt_state = optimizer.init(params)

    def loss_fn(params, xy, mask, goals, slot, scene):
        if compute_dtype is not None:
            params = jax.tree.map(lambda p: p.astype(compute_dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
        rel, _, _ = model.forward(params, xy[:obs], mask[:obs], goals, slot,
                                  prediction_truth=xy[obs:seq-1], prediction_truth_mask=mask[obs:seq-1])
        if compute_dtype is not None:
            rel = rel.astype(jnp.float32)
        targets = xy[obs:seq, :, 0] - xy[obs-1:seq-1, :, 0]
        return prediction_loss(rel[-pred:, :, 0], targets, scene) * batch

    def step_core(carry, xy, mask, goals, slot, scene, key):
        del key
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, xy, mask, goals, slot, scene)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state), loss

    runner = C.make_bucket_epoch_runner(step_core, augment=True)
    n_scenes, a, t = 4096, 8, 21
    rng = np.random.default_rng(0)
    xs = jnp.asarray((rng.normal(size=(n_scenes, t, a, 2)).cumsum(axis=1)*0.3).astype(np.float32))
    mask = jnp.ones((n_scenes, t, a), bool)
    goals = jnp.zeros((n_scenes, a, 2), jnp.float32)
    num_agents = jnp.full((n_scenes,), a, jnp.int32)
    idx = jnp.asarray(rng.permutation(n_scenes).reshape(-1, batch).astype(np.int32))
    valid = jnp.ones(idx.shape, bool)

    carry = (params, opt_state)
    def run(carry, key):
        carry, losses = runner(carry, xs, mask, goals, num_agents, idx, valid, key)
        float(jnp.sum(losses))
        return carry
    carry = run(carry, jax.random.PRNGKey(0))
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        carry = run(carry, jax.random.PRNGKey(i+1))
    dt = time.perf_counter() - t0
    return round(n_scenes*iters/dt, 1)

for name, dt in [("f32", None), ("bf16", jnp.bfloat16)]:
    print(json.dumps({"dtype": name, "train_scenes_per_sec": bench(dt)}))
    sys.stdout.flush()
