"""Weak-scaling measurement of the sharded train step on a virtual CPU mesh.

Usage: python scripts/weak_scaling.py <n_devices> [scenes_per_device]

Fixes the per-device scene count and measures steady-state steps/sec of the
full loss -> psum grad -> adam update program as the data axis grows 1 -> 8
virtual CPU devices (the CI stand-in for an ICI mesh; absolute numbers are
CPU-bound, the *ratio* is the scaling signal recorded in docs/SCALING.md).
"""

import os
import sys
import time

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
per_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 64

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={n}").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from trajnetplusplusbaselines_tpu.models.lstm import LSTM  # noqa: E402
from trajnetplusplusbaselines_tpu.parallel import make_mesh, make_sharded_train_step  # noqa: E402
from trajnetplusplusbaselines_tpu.trainers.common import make_optimizer  # noqa: E402


def main():
    s, a, t = per_dev * n, 8, 21
    model = LSTM(pool=None)
    params = model.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    mesh = make_mesh(n, tp=1)
    step, place_batch, place_params = make_sharded_train_step(model, optimizer, mesh)

    rng = np.random.default_rng(0)
    xy = rng.normal(size=(t, s, a, 2)).cumsum(axis=0).astype(np.float32)
    mask = np.ones((t, s, a), bool)
    goals = np.zeros((s, a, 2), np.float32)
    slot = np.ones((s, a), bool)
    scene = np.ones(s, bool)

    with mesh:
        batch = place_batch(xy, mask, goals, slot, scene)
        params = place_params(params)
        opt_state = optimizer.init(params)
        params, opt_state, loss = step(params, opt_state, *batch)  # compile
        jax.block_until_ready(loss)
        n_steps = 20
        t0 = time.time()
        for _ in range(n_steps):
            params, opt_state, loss = step(params, opt_state, *batch)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / n_steps

    print(
        f'{{"devices": {n}, "scenes_per_device": {per_dev}, '
        f'"scenes_per_sec": {s / dt:.0f}, "step_ms": {dt * 1000:.1f}}}'
    )


if __name__ == "__main__":
    main()
