"""Sharded training and rollout steps.

Data parallelism over the scene axis with tensor-parallel weight sharding:
parameters carry NamedShardings (replicated or model-axis split), batches
shard scenes over the data axis, and one jit of the full
loss -> grad -> optimizer-update program lets XLA insert the psum
all-reduces over ICI (the NCCL-equivalent the reference never had,
SURVEY.md section 2.5).
"""

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses import prediction_loss
from .mesh import batch_sharding, scene_sharding, shard_params
from .multihost import put_global


def make_sharded_train_step(model, optimizer, mesh, obs_length: int = 9,
                            pred_length: int = 12, batch_size: int = 8):
    """A pjit-style train step: scenes sharded over 'data', params TP-sharded.

    Returns (step, place_batch, place_params); step(params, opt_state, *batch)
    -> (params, opt_state, loss).
    """
    seq_length = obs_length + pred_length

    def loss_fn(params, xy, mask, goals, slot_mask, scene_mask):
        rel, pred, valid = model.forward(
            params,
            xy[:obs_length], mask[:obs_length], goals, slot_mask,
            prediction_truth=xy[obs_length : seq_length - 1],
            prediction_truth_mask=mask[obs_length : seq_length - 1],
        )
        targets = (
            xy[obs_length:seq_length, :, 0] - xy[obs_length - 1 : seq_length - 1, :, 0]
        )
        return prediction_loss(rel[-pred_length:, :, 0], targets, scene_mask) * batch_size

    @jax.jit
    def step(params, opt_state, xy, mask, goals, slot_mask, scene_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, xy, mask, goals, slot_mask, scene_mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    bsh = batch_sharding(mesh)
    ssh = scene_sharding(mesh)

    def place_batch(xy, mask, goals, slot_mask, scene_mask):
        # host arrays go straight to put_global: pre-converting with
        # jnp.asarray would commit them to the default device only for the
        # multi-process branch to pull them back to host (np.asarray)
        return (
            put_global(bsh, xy),
            put_global(bsh, mask),
            put_global(ssh, goals),
            put_global(ssh, slot_mask),
            put_global(ssh, scene_mask),
        )

    def place_params(params):
        return shard_params(mesh, params)

    return step, place_batch, place_params


def make_sharded_rollout(model, mesh, obs_length: int = 9, n_predict: int = 12):
    """Sharded autoregressive rollout over the scene axis (inference)."""

    @jax.jit
    def rollout(params, xy, mask, goals, slot_mask):
        return model.forward(
            params, xy[:obs_length], mask[:obs_length], goals, slot_mask,
            n_predict=n_predict,
        )

    bsh = batch_sharding(mesh)
    ssh = scene_sharding(mesh)

    def place_batch(xy, mask, goals, slot_mask):
        return (
            put_global(bsh, xy),
            put_global(bsh, mask),
            put_global(ssh, goals),
            put_global(ssh, slot_mask),
        )

    return rollout, place_batch
