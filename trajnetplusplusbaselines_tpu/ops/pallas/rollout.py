"""Full autoregressive D-LSTM rollout over the fused Pallas step.

Reproduces LSTM.forward(..., n_predict) for the flagship configuration
(directional grid pooling, one_layer embedding, no goals) with the fused
kernel inside both the encoder and decoder ``lax.scan``s.  State stays in the
kernel's agent-major [A, S, ...] layout across the whole rollout; outputs are
transposed back to the framework's [T, S, A, ...] convention at the end.
Inference only.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from .fused_step import fused_dlstm_step, weights_from_params


@functools.partial(
    jax.jit,
    static_argnames=("n_predict", "a", "hidden", "emb_dim", "pool_dim", "n",
                     "cell_side", "constant", "scene_block"),
)
def fused_rollout(params, observed, observed_mask, n_predict=12, *, a=8,
                  hidden=128, emb_dim=64, pool_dim=256, n=12, cell_side=0.6,
                  constant=0.0, scene_block=128):
    """observed [T_obs, S, A, 2], observed_mask [T_obs, S, A] bool.

    Returns (rel_pred [T', S, A, 5], pred [T', S, A, 2], valid [T', S, A]).
    """
    s = observed.shape[1]
    enc_w = weights_from_params(params, "encoder")
    dec_w = weights_from_params(params, "decoder")
    kw = dict(a=a, hidden=hidden, emb_dim=emb_dim, pool_dim=pool_dim, n=n,
              cell_side=cell_side, constant=constant, scene_block=scene_block)

    # agent-major global layout [T, A, S, ...]
    obs_am = jnp.moveaxis(observed, 2, 1)
    mask_am = jnp.moveaxis(observed_mask.astype(jnp.float32), 2, 1)

    def enc_body(carry, inputs):
        h, c = carry
        obs1, obs2, p1, p2 = inputs
        h, c, normal, mask = fused_dlstm_step(obs1, obs2, p1, p2, h, c, enc_w, **kw)
        position = (obs2 + normal[..., :2]) * mask[..., None]
        return (h, c), (normal, mask, position)

    h0 = jnp.zeros((a, s, hidden), jnp.float32)
    (h, c), (enc_normals, enc_masks, enc_positions) = jax.lax.scan(
        enc_body, (h0, h0),
        (obs_am[:-1], obs_am[1:], mask_am[:-1], mask_am[1:]),
    )

    # decoder seeding: GT last observation for neighbours, model positions
    # for the primary lane (agent 0)
    pos_a = obs_am[-1].at[0].set(enc_positions[-2][0])
    valid_a = mask_am[-1].at[0].set(enc_masks[-2][0])
    pos_b, valid_b = enc_positions[-1], enc_masks[-1]

    def dec_body(state, _):
        h, c, pos_a, valid_a, pos_b, valid_b = state
        h, c, normal, mask = fused_dlstm_step(
            pos_a, pos_b, valid_a, valid_b, h, c, dec_w, **kw
        )
        new_pos = (pos_b + normal[..., :2]) * mask[..., None]
        return (h, c, pos_b, valid_b, new_pos, mask), (normal, mask, new_pos)

    state = (h, c, pos_a, valid_a, pos_b, valid_b)
    _, (dec_normals, dec_masks, dec_positions) = jax.lax.scan(
        dec_body, state, None, length=n_predict - 1
    )

    rel = jnp.concatenate([enc_normals, dec_normals], axis=0)
    pred = jnp.concatenate([enc_positions, dec_positions], axis=0)
    valid = jnp.concatenate([enc_masks, dec_masks], axis=0)
    # back to [T, S, A, ...]
    return (
        jnp.moveaxis(rel, 1, 2),
        jnp.moveaxis(pred, 1, 2),
        jnp.moveaxis(valid, 1, 2) > 0,
    )
