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
the sublane dim, so each per-agent stage is a plain 2D [SB, K] x [K, N]
matmul (SB = 128 rows fills the MXU) and no vector ever needs a
sublane-merging reshape (unsupported by Mosaic).  The agent i is a Pallas
grid dimension (per-i operands/outputs via BlockSpec index maps) and the
neighbour j loop is a fori_loop with dynamic leading-dim VMEM loads, so the
program size is O(1) in A — round 2's fully unrolled A^2 pair loop was
rejected by Mosaic past A=8.

Semantics identical to GridBasedPooling(type_='directional',
embedding_arch='one_layer') + LSTM.step for goal-free models: last-write-wins
cell collisions, out-of-range neighbours writing `constant` into cell 0, and
masked state updates.  Inference-path only (training keeps the XLA
formulation for autodiff).

STATUS — reference implementation, not a production path (round-3 verdict).
Measured on TPU v5e: this rolled form compiles in ~11 s at A=8 and does 98k
scenes/sec vs 156k for the XLA select-chain rollout; at A>=32 the remote
Mosaic compile helper crashes (HTTP 500, subprocess exit 1 — no diagnostic
available through the tunnel).  Meanwhile the XLA argmax-reduce grid forms
(ops/pooling/grid.py) removed the large-A cliff this kernel targeted (A=32:
26k scenes/s).  On TPU the last-write-wins scatter is inherently an O(A*G)
VPU compare-reduce per agent whichever framework expresses it, so there is
no algorithmic headroom for a kernel win here — kept because its
interpret-mode tests (tests/test_pallas_fused.py) document the agent-major
VMEM layout and the fused-step dataflow.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(obs1_ref, obs2_ref, p1_ref, p2_ref,
            obs1_i_ref, obs2_i_ref, p1_i_ref, p2_i_ref, h_ref, c_ref,
            w_emb_ref, b_emb_ref, w_grid_ref, b_grid_ref,
            w_ih_ref, w_hh_ref, b_gates_ref, w_h2n_ref, b_h2n_ref,
            h_out_ref, c_out_ref, normal_ref, mask_out_ref,
            *, a, hidden, emb_dim, pool_dim, n, cell_side, constant):
    sb = obs1_ref.shape[1]  # scenes in this block (sublane dim)
    g = n * n
    i_idx = pl.program_id(1)  # this step's agent (grid dim 1)

    obs2_i = obs2_i_ref[0]                     # [SB, 2]
    p1_i = p1_i_ref[0]                         # [SB, 1] float {0, 1}
    p2_i = p2_i_ref[0]
    maskf_i = p1_i * p2_i                      # [SB, 1]
    vel_i = (obs2_i - obs1_i_ref[0]) * maskf_i

    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (sb, g), 1)

    # ---- input embedding: relu(4 * vel @ W) (tag channels stay zero)
    emb = jax.nn.relu(
        jnp.dot(vel_i * 4.0, w_emb_ref[:], preferred_element_type=jnp.float32)
        + b_emb_ref[:]
    )  # [SB, emb_dim - 2]

    # ---- directional grid of agent i: ascending-j select chain over a
    # fori_loop (O(1) program size in A, unlike the old fully-unrolled
    # pairwise loop that Mosaic rejected past A=8)
    def jbody(j, carry):
        grid_x, grid_y = carry
        o2j = obs2_ref[j]          # dynamic leading-dim VMEM load, [SB, 2]
        p1j = p1_ref[j]            # [SB, 1]
        p2j = p2_ref[j]
        rel = o2j - obs2_i         # [SB, 2]
        oij = rel / cell_side + (n / 2.0)
        not_self = (j != i_idx).astype(jnp.float32)
        in_range = (
            (oij[:, 0:1] >= 0).astype(jnp.float32)
            * (oij[:, 0:1] < n).astype(jnp.float32)
            * (oij[:, 1:2] >= 0).astype(jnp.float32)
            * (oij[:, 1:2] < n).astype(jnp.float32)
            * p2_i * p2j
        )  # [SB, 1]
        cell = oij.astype(jnp.int32)
        flat_cell = cell[:, 0:1] * n + cell[:, 1:2]
        # invisible / out-of-range neighbours write `constant` at cell 0,
        # exactly like the XLA path (NaN -> -500 m in the reference)
        write_cell = (flat_cell.astype(jnp.float32) * in_range).astype(jnp.int32)
        vel_j = (o2j - obs1_ref[j]) * (p1j * p2j)
        rel_vel = (vel_j - vel_i) * (maskf_i * p1j * p2j)
        wx = rel_vel[:, 0:1] * in_range + constant * (1.0 - in_range)
        wy = rel_vel[:, 1:2] * in_range + constant * (1.0 - in_range)

        hit = (write_cell == cell_iota) & (not_self > 0)  # [SB, G]
        grid_x = jnp.where(hit, wx, grid_x)
        grid_y = jnp.where(hit, wy, grid_y)
        return grid_x, grid_y

    grid_x = jnp.full((sb, g), constant, jnp.float32)
    grid_y = jnp.full((sb, g), constant, jnp.float32)
    grid_x, grid_y = jax.lax.fori_loop(0, a, jbody, (grid_x, grid_y))

    # channel-major flatten matching the XLA path: [D, n, n]
    grid_flat = jnp.concatenate([grid_x, grid_y], axis=-1)  # [SB, 2G]

    pooled = jax.nn.relu(
        jnp.dot(grid_flat, w_grid_ref[:], preferred_element_type=jnp.float32)
        + b_grid_ref[:]
    )  # [SB, pool_dim]

    # ---- LSTM gates
    tags = jnp.zeros((sb, 2), jnp.float32)
    inp = jnp.concatenate([emb, tags, pooled], axis=-1)
    h = h_ref[0]  # [SB, H]
    c = c_ref[0]
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

    h_out_ref[0] = h_new * maskf_i + h * (1.0 - maskf_i)
    c_out_ref[0] = c_new * maskf_i + c * (1.0 - maskf_i)
    normal_ref[0] = normal * maskf_i
    mask_out_ref[0] = maskf_i


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

    def all_agents(*feat):
        """Full-A view (pair terms); revisited for every agent grid step."""
        return pl.BlockSpec(
            (a, scene_block) + feat,
            lambda sblk, i: (0, sblk) + (0,) * len(feat),
            memory_space=pltpu.VMEM,
        )

    def per_agent(*feat):
        """Agent i's slice, selected by the agent grid dimension."""
        return pl.BlockSpec(
            (1, scene_block) + feat,
            lambda sblk, i: (i, sblk) + (0,) * len(feat),
            memory_space=pltpu.VMEM,
        )

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda sblk, i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    w = weights
    f32 = jnp.float32
    p1f = present1.astype(f32)[..., None]  # [A, S, 1]
    p2f = present2.astype(f32)[..., None]
    o1, o2 = obs1.astype(f32), obs2.astype(f32)
    h_new, c_new, normal, mask = pl.pallas_call(
        kernel,
        grid=(grid_steps, a),
        in_specs=[
            all_agents(2), all_agents(2), all_agents(1), all_agents(1),
            per_agent(2), per_agent(2), per_agent(1), per_agent(1),
            per_agent(hidden), per_agent(hidden),
            full(w["w_emb"]), full(w["b_emb"]),
            full(w["w_grid"]), full(w["b_grid"]),
            full(w["w_ih"]), full(w["w_hh"]), full(w["b_gates"]),
            full(w["w_h2n"]), full(w["b_h2n"]),
        ],
        out_specs=[
            per_agent(hidden), per_agent(hidden), per_agent(5), per_agent(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((a, s, hidden), f32),
            jax.ShapeDtypeStruct((a, s, hidden), f32),
            jax.ShapeDtypeStruct((a, s, 5), f32),
            jax.ShapeDtypeStruct((a, s, 1), f32),
        ],
    )(
        o1, o2, p1f, p2f,
        o1, o2, p1f, p2f,
        h.astype(f32), c.astype(f32),
        w["w_emb"], w["b_emb"], w["w_grid"], w["b_grid"],
        w["w_ih"], w["w_hh"], w["b_gates"], w["w_h2n"], w["b_h2n"],
    )
    return h_new, c_new, normal, mask[..., 0]


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
