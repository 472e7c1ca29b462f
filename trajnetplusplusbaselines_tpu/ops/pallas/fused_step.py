"""Fused Pallas TPU kernel: directional-grid pooling + embeddings + LSTM step.

The D-LSTM inner loop (SURVEY.md: the hottest op, an O(A^2) interaction build
feeding an LSTM cell every timestep) as ONE kernel per scan step.  The XLA
path materializes the [S, A, G, D] interaction grid in HBM between the
scatter and the embedding matmul; here the grid lives only in VMEM:

    HBM reads : obs1, obs2, masks, h, c           (~1.2 KB / agent-row)
    VMEM      : pairwise rel-velocities -> select-chain scatter -> grid
                -> grid-embed matmul (MXU) -> concat with input embedding
                -> fused gate matmuls (MXU) -> LSTM elementwise (VPU)
    HBM writes: h', c', normal

Layout: everything is agent-major [A, SB, features] with the scene block as
the sublane dim, so each of the A per-agent stages is a plain 2D
[SB, K] x [K, N] matmul (SB = 128 rows fills the MXU) and no vector ever
needs a sublane-merging reshape (unsupported by Mosaic).  Pairwise agent
structure unrolls over the small static A.

Semantics identical to GridBasedPooling(type_='directional',
embedding_arch='one_layer') + LSTM.step for goal-free models: last-write-wins
cell collisions, out-of-range neighbours writing `constant` into cell 0, and
masked state updates.  Inference-path only (training keeps the XLA
formulation for autodiff).

Measured on TPU v5e at the benchmark shape (S=65536, A=8, H=128): 189k
scenes/sec vs 231k for the XLA select-chain path — at these small per-agent
dims XLA's automatic fusion + pipelining already saturates HBM, and the
kernel's per-agent [SB, K] matmuls underfill the MXU, so the XLA path stays
the default.  The kernel's VMEM-resident grid becomes the winning layout as
the agent count grows (XLA's materialized [S, A, G, D] grid scales
quadratically with A); it is kept as a verified alternative backend.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(obs1_ref, obs2_ref, p1_ref, p2_ref, h_ref, c_ref,
            w_emb_ref, b_emb_ref, w_grid_ref, b_grid_ref,
            w_ih_ref, w_hh_ref, b_gates_ref, w_h2n_ref, b_h2n_ref,
            h_out_ref, c_out_ref, normal_ref, mask_out_ref,
            *, a, hidden, emb_dim, pool_dim, n, cell_side, constant):
    sb = obs1_ref.shape[1]  # scenes in this block (sublane dim)
    g = n * n

    obs2 = [obs2_ref[i] for i in range(a)]      # each [SB, 2]
    p1 = [p1_ref[i] for i in range(a)]          # each [SB] float {0, 1}
    p2 = [p2_ref[i] for i in range(a)]
    maskf = [p1[i] * p2[i] for i in range(a)]
    vel = [
        (obs2[i] - obs1_ref[i]) * maskf[i][:, None] for i in range(a)
    ]  # masked velocities, each [SB, 2]

    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (sb, g), 1)

    for i in range(a):
        # ---- input embedding: relu(4 * vel @ W) (tag channels stay zero)
        emb = jax.nn.relu(
            jnp.dot(vel[i] * 4.0, w_emb_ref[:], preferred_element_type=jnp.float32)
            + b_emb_ref[:]
        )  # [SB, emb_dim - 2]

        # ---- directional grid of agent i, built neighbour by neighbour
        grid_x = jnp.full((sb, g), constant, jnp.float32)
        grid_y = jnp.full((sb, g), constant, jnp.float32)
        for j in range(a):
            if j == i:
                continue
            rel = obs2[j] - obs2[i]  # [SB, 2]
            oij = rel / cell_side + (n / 2.0)
            in_range = (
                (oij[:, 0] >= 0).astype(jnp.float32)
                * (oij[:, 0] < n).astype(jnp.float32)
                * (oij[:, 1] >= 0).astype(jnp.float32)
                * (oij[:, 1] < n).astype(jnp.float32)
                * p2[i] * p2[j]
            )  # [SB]
            cell = oij.astype(jnp.int32)
            flat_cell = cell[:, 0] * n + cell[:, 1]
            # invisible / out-of-range neighbours write `constant` at cell 0,
            # exactly like the XLA path (NaN -> -500 m in the reference)
            write_cell = (flat_cell.astype(jnp.float32) * in_range).astype(jnp.int32)
            rel_vel = (vel[j] - vel[i]) * (maskf[i] * maskf[j])[:, None]
            wx = rel_vel[:, 0] * in_range + constant * (1.0 - in_range)
            wy = rel_vel[:, 1] * in_range + constant * (1.0 - in_range)

            hit = write_cell[:, None] == cell_iota  # [SB, G]
            grid_x = jnp.where(hit, wx[:, None], grid_x)
            grid_y = jnp.where(hit, wy[:, None], grid_y)

        # channel-major flatten matching the XLA path: [D, n, n]
        grid_flat = jnp.concatenate([grid_x, grid_y], axis=-1)  # [SB, 2G]

        pooled = jax.nn.relu(
            jnp.dot(grid_flat, w_grid_ref[:], preferred_element_type=jnp.float32)
            + b_grid_ref[:]
        )  # [SB, pool_dim]

        # ---- LSTM gates
        tags = jnp.zeros((sb, 2), jnp.float32)
        inp = jnp.concatenate([emb, tags, pooled], axis=-1)
        h = h_ref[i]  # [SB, H]
        c = c_ref[i]
        gates = (
            jnp.dot(inp, w_ih_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_gates_ref[:]
        )
        gi = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
        gf = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        go = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)

        raw = (
            jnp.dot(h_new, w_h2n_ref[:], preferred_element_type=jnp.float32)
            + b_h2n_ref[:]
        )
        normal = jnp.concatenate(
            [
                raw[:, 0:2],
                0.01 + 0.2 * jax.nn.sigmoid(raw[:, 2:4]),
                0.7 * jax.nn.sigmoid(raw[:, 4:5]),
            ],
            axis=-1,
        )

        m = maskf[i][:, None]
        h_out_ref[i] = h_new * m + h * (1.0 - m)
        c_out_ref[i] = c_new * m + c * (1.0 - m)
        normal_ref[i] = normal * m
        mask_out_ref[i] = maskf[i]


@functools.partial(
    jax.jit,
    static_argnames=("a", "hidden", "emb_dim", "pool_dim", "n", "cell_side",
                     "constant", "scene_block"),
)
def fused_dlstm_step(obs1, obs2, present1, present2, h, c, weights: Dict,
                     *, a=8, hidden=128, emb_dim=64, pool_dim=256, n=12,
                     cell_side=0.6, constant=0.0, scene_block=128):
    """One fused D-LSTM step, agent-major state.

    obs/present/h/c: [A, S, ...]; weights: {w_emb [2, emb-2], b_emb,
    w_grid [2*n*n, pool], b_grid, w_ih [emb+pool, 4H], w_hh [H, 4H],
    b_gates [4H], w_h2n [H, 5], b_h2n [5]}.
    Returns (h' [A,S,H], c' [A,S,H], normal [A,S,5], mask [A,S] float).
    """
    s = obs1.shape[1]
    assert s % scene_block == 0, f"scenes {s} % scene_block {scene_block} != 0"
    grid_steps = s // scene_block

    kernel = functools.partial(
        _kernel, a=a, hidden=hidden, emb_dim=emb_dim, pool_dim=pool_dim,
        n=n, cell_side=cell_side, constant=constant,
    )

    def block(*feat):
        return pl.BlockSpec(
            (a, scene_block) + feat,
            lambda i: (0, i) + (0,) * len(feat),
            memory_space=pltpu.VMEM,
        )

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    w = weights
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(grid_steps,),
        in_specs=[
            block(2), block(2), block(), block(),
            block(hidden), block(hidden),
            full(w["w_emb"]), full(w["b_emb"]),
            full(w["w_grid"]), full(w["b_grid"]),
            full(w["w_ih"]), full(w["w_hh"]), full(w["b_gates"]),
            full(w["w_h2n"]), full(w["b_h2n"]),
        ],
        out_specs=[
            block(hidden), block(hidden), block(5), block(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((a, s, hidden), f32),
            jax.ShapeDtypeStruct((a, s, hidden), f32),
            jax.ShapeDtypeStruct((a, s, 5), f32),
            jax.ShapeDtypeStruct((a, s), f32),
        ],
    )(
        obs1.astype(f32), obs2.astype(f32),
        present1.astype(f32), present2.astype(f32),
        h.astype(f32), c.astype(f32),
        w["w_emb"], w["b_emb"], w["w_grid"], w["b_grid"],
        w["w_ih"], w["w_hh"], w["b_gates"], w["w_h2n"], w["b_h2n"],
    )


def weights_from_params(params: Dict, cell: str = "decoder") -> Dict:
    """Extract the kernel weight dict from LSTM params."""

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    return {
        "w_emb": f32(params["input_embedding"]["linear"]["w"]),
        "b_emb": f32(params["input_embedding"]["linear"]["b"]),
        "w_grid": f32(params["pool"]["embedding"][0]["w"]),
        "b_grid": f32(params["pool"]["embedding"][0]["b"]),
        "w_ih": f32(params[cell]["w_ih"]),
        "w_hh": f32(params[cell]["w_hh"]),
        "b_gates": f32(params[cell]["b_ih"] + params[cell]["b_hh"]),
        "w_h2n": f32(params["hidden2normal"]["linear"]["w"]),
        "b_h2n": f32(params["hidden2normal"]["linear"]["b"]),
    }
