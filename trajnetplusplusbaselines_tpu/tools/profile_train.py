"""Profiler hook: capture a device trace of one training step.

Behavioural mirror of /root/reference/trajnetbaselines/lstm/profile_train.py:12-26
(torch autograd profiler -> chrome trace), TPU-native: ``jax.profiler.trace``
captures XLA/TPU activity viewable in Perfetto / TensorBoard.

Usage:
    python -m trajnetplusplusbaselines_tpu.tools.profile_train \
        [--type directional] [--trace_dir profile_trace] [--steps 3]
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--type", default="directional")
    parser.add_argument("--trace_dir", default="profile_trace")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--scenes", type=int, default=64)
    parser.add_argument("--agents", type=int, default=16)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..losses import prediction_loss
    from ..models.lstm import LSTM
    from ..ops.pooling import make_pool
    from ..trainers.common import make_optimizer

    pool = make_pool(args.type, None)
    model = LSTM(pool=pool)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)

    t, s, a = 21, args.scenes, args.agents
    rng = np.random.default_rng(0)
    xy = jnp.asarray((rng.normal(size=(t, s, a, 2)).cumsum(axis=0) * 0.3).astype(np.float32))
    mask = jnp.ones((t, s, a), bool)
    goals = jnp.zeros((s, a, 2))
    slot = jnp.ones((s, a), bool)
    scene_mask = jnp.ones((s,), bool)

    def loss_fn(params):
        rel, _, _ = model.forward(
            params, xy[:9], mask[:9], goals, slot,
            prediction_truth=xy[9:20], prediction_truth_mask=mask[9:20],
        )
        targets = xy[9:21, :, 0] - xy[8:20, :, 0]
        return prediction_loss(rel[-12:, :, 0], targets, scene_mask)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    # compile outside the trace
    params, opt_state, loss = train_step(params, opt_state)
    float(loss)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            params, opt_state, loss = train_step(params, opt_state)
        float(loss)

    print(f"trace written to {args.trace_dir}/ (open with Perfetto or TensorBoard)")


if __name__ == "__main__":
    main()
