#!/usr/bin/env python
"""Minimized repro for the dir_social vmapped-ensemble HBM exhaustion.

Round-4 registry runs found the 5-member vmapped ensemble trainer dies on
`--type dir_social` on one v5e chip (registry.log: TPU worker crash; round 5
reproduces it as a clean RESOURCE_EXHAUSTED).  This distills it to one
jitted step: vmap over E members of value_and_grad of the dir_social
teacher-forced forward at the production bucket shape (batch 8, A=128
agent slots, T=21).  dir_social stacks TWO grids (directional d=2 +
social hidden-state latent_dim=16), so the backward pass saves
[E, B, A, G, 18]-shaped scatter inputs per rollout step — at A=128 slots
that is the HBM cliff the occupancy/directional/social singles do not hit.

Usage (real chip):
    python scripts/repro_dirsocial_oom.py --members 5 --a 128   # exhausts
    python scripts/repro_dirsocial_oom.py --members 2 --a 128   # fits?
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--members", type=int, default=5)
    p.add_argument("--a", type=int, default=128, help="agent slots per scene")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from trajnetplusplusbaselines_tpu.models.lstm import LSTM
    from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling

    pool = GridBasedPooling(
        type_="dir_social", hidden_dim=128, cell_side=0.6, n=12, out_dim=256,
        latent_dim=16,
    )
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    model.remat = args.remat
    stacked = jax.vmap(model.init_params)(
        jnp.stack([jax.random.PRNGKey(s) for s in range(args.members)])
    )

    t, b, a = 21, args.batch, args.a
    rng = np.random.default_rng(0)
    xy = jnp.asarray((rng.normal(size=(t, b, a, 2)).cumsum(0) * 0.3), jnp.float32)
    mask = jnp.ones((t, b, a), bool)
    goals = jnp.zeros((b, a, 2), jnp.float32)
    slot = jnp.ones((b, a), bool)
    scene = jnp.ones((b,), bool)

    def loss_fn(params):
        rel, _, _ = model.forward(
            params, xy[:9], mask[:9], goals, slot,
            prediction_truth=xy[9:20], prediction_truth_mask=mask[9:20],
        )
        return jnp.sum(rel[-12:, :, 0, :2])

    @jax.jit
    def step(params):
        return jax.vmap(jax.value_and_grad(loss_fn))(params)

    loss, grads = step(stacked)
    print(f"ok: members={args.members} A={a} remat={args.remat} "
          f"loss[0]={float(loss[0]):.3f}")


if __name__ == "__main__":
    main()
