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

Round-5 findings on the real chip (v5e, 16G HBM):
    --members 5 --a 128            ok   (one unscanned step FITS)
    --members 5 --a 128 --scan 8   ok   (scanned mini-epoch FITS)
so the exhaustion is not a single-step or lax.scan pathology: it needs the
PRODUCTION context — the full resident dataset (~10k batches of [T,B,A]
buckets device_put into HBM) plus the 5-member dir_social step working set.
Those fit individually; together they cross 16G (nmmp overshot by 275 MB
the same way until its message pass was linear-decomposed).  Mitigation is
therefore capacity management, not a kernel fix: the ensemble trainer
auto-splits the member axis on resource failures (trainers/ensemble.py),
which round-5 proved end-to-end for dir_social (5 -> 3+2, both chunks
trained; dirsocial_asplit_r5.log).

Usage (real chip):
    python scripts/repro_dirsocial_oom.py --members 5 --a 128 [--scan 8]
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
    p.add_argument("--scan", type=int, default=0,
                   help="scan a resident mini-epoch of N batches (0 = one "
                        "unscanned step)")
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

    def loss_fn(params, xy, mask, goals, slot):
        rel, _, _ = model.forward(
            params, xy[:9], mask[:9], goals, slot,
            prediction_truth=xy[9:20], prediction_truth_mask=mask[9:20],
        )
        return jnp.sum(rel[-12:, :, 0, :2])

    if args.scan == 0:
        @jax.jit
        def step(params):
            return jax.vmap(
                jax.value_and_grad(lambda p: loss_fn(p, xy, mask, goals, slot))
            )(params)

        loss, grads = step(stacked)
        print(f"ok: members={args.members} A={a} remat={args.remat} "
              f"loss[0]={float(loss[0]):.3f}")
        return

    # scanned mini-epoch: the production bucket runner's shape — resident
    # [N, T, B, A, 2] batches on device, lax.scan over them with a donated
    # params carry (trainers/common.py make_bucket_epoch_runner)
    n = args.scan
    res_xy = jnp.asarray(
        (rng.normal(size=(n, t, b, a, 2)).cumsum(1) * 0.3), jnp.float32)
    res_mask = jnp.ones((n, t, b, a), bool)
    res_goals = jnp.zeros((n, b, a, 2), jnp.float32)
    res_slot = jnp.ones((n, b, a), bool)

    @jax.jit
    def epoch(params):
        def body(carry, batch):
            bxy, bmask, bgoals, bslot = batch
            loss, grads = jax.vmap(
                jax.value_and_grad(
                    lambda p: loss_fn(p, bxy, bmask, bgoals, bslot))
            )(carry)
            carry = jax.tree.map(lambda p, g: p - 1e-3 * g, carry, grads)
            return carry, loss

        return jax.lax.scan(body, params,
                            (res_xy, res_mask, res_goals, res_slot))

    params2, losses = epoch(stacked)
    print(f"ok: members={args.members} A={a} remat={args.remat} scan={n} "
          f"loss[0,0]={float(losses[0][0]):.3f}")


if __name__ == "__main__":
    main()
