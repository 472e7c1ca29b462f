"""Grid-based interaction pooling (occupancy / directional / social / dir_social).

Behavioural mirror of /root/reference/trajnetbaselines/lstm/gridbased_pooling.py:15-400,
re-designed for dense ``[scene, agent, ...]`` batches:

- The reference deletes the diagonal, sends NaN positions to -500 m, scatters
  per-neighbour values into a flattened grid with last-write-wins collisions
  and funnels every out-of-range neighbour into cell 0 with the background
  ``constant``.  Here the same semantics are expressed as one dense masked
  one-hot contraction per step (an MXU-shaped [G, A] x [A, D] batched matmul),
  with the diagonal and absent agents handled by masks instead of NaN.
- Blur (stride-1 average pool, count_include_pad) and the p=1 lp-pool become
  ``lax.reduce_window`` calls.

Exactness notes (parity-critical, SURVEY.md 2.3):
- duplicate cell indices resolve to the highest neighbour index (torch's
  sequential advanced-indexing assignment ends with the last write),
- out-of-range neighbours (including absent ones, which the reference places
  at -500 m) overwrite cell 0 with ``constant`` in neighbour order,
- grids are produced for every agent; the step engine discards rows of
  non-participating agents exactly like the reference's masked selection.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import init_linear, init_lstm_cell, linear, lstm_cell, init_mlp, mlp


# --------------------------------------------------------------------------
# Last-write-wins scatter implementations.  All take the per-pair write plan
#   write_cell  [S, A, A] int32   destination cell of neighbour j in i's grid
#   write_value [S, A, A, D]      value neighbour j writes (already masked)
#   write_valid [S, A, A] bool    whether j writes at all (non-self)
# and produce the grid [S, A, G, D] with the reference's collision semantics:
# ascending-j sequential assignment, i.e. the highest valid j wins each cell
# and untouched cells keep the background ``constant``
# (/root/reference/trajnetbaselines/lstm/gridbased_pooling.py:278-293).


def _lastwrite_chain(write_cell, write_value, write_valid, constant, g):
    """Unrolled ascending-j select chain: fully fusible elementwise ops, the
    fastest form for small A, but the graph (and compile time) grows O(A)."""
    s, a = write_cell.shape[:2]
    d = write_value.shape[-1]
    cell_iota = jnp.arange(g, dtype=write_cell.dtype)
    grid = jnp.full((s, a, g, d), constant, dtype=write_value.dtype)
    for j in range(a):
        hit = (write_cell[:, :, j, None] == cell_iota) & write_valid[:, :, j, None]
        grid = jnp.where(hit[..., None], write_value[:, :, j, None, :], grid)
    return grid


def _lastwrite_scatter_max(write_cell, write_value, write_valid, constant, g):
    """Runtime scatter-max of the writer index, then gather its value.
    O(1) graph size, but XLA lowers the scatter to a serialized per-update
    loop on TPU — measured 46x slower than the reduce form at A=32."""
    s, a = write_cell.shape[:2]
    j_iota = jnp.broadcast_to(
        jnp.arange(a, dtype=jnp.int32)[None, None, :], write_cell.shape
    )
    j_writer = jnp.where(write_valid, j_iota, -1)
    winner = (
        jnp.full((s, a, g), -1, dtype=jnp.int32)
        .at[
            jnp.arange(s, dtype=jnp.int32)[:, None, None],
            jnp.arange(a, dtype=jnp.int32)[None, :, None],
            write_cell,
        ]
        .max(j_writer)
    )
    gathered = jnp.take_along_axis(
        write_value, jnp.maximum(winner, 0)[..., None], axis=2
    )
    return jnp.where(
        (winner >= 0)[..., None], gathered,
        jnp.asarray(constant, dtype=write_value.dtype),
    )


def _winner_reduce(write_cell, write_valid, g):
    """winner[s, i, g] = highest valid j writing cell g, -1 if none — as a
    max-reduction over a broadcast compare.  No scatter: XLA fuses the
    [S, A, A, G] one-hot compare into the reduce loop (nothing 4-D ever
    lands in HBM), and the loop is pure VPU work."""
    a = write_cell.shape[2]
    cell_iota = jnp.arange(g, dtype=write_cell.dtype)
    j_iota = jnp.arange(a, dtype=jnp.int32)
    hit = (write_cell[..., None] == cell_iota) & write_valid[..., None]  # [S,A,A,G]
    return jnp.max(
        jnp.where(hit, j_iota[None, None, :, None], jnp.int32(-1)), axis=2
    )  # [S, A, G]


def _lastwrite_argmax_gather(write_cell, write_value, write_valid, constant, g):
    """Fused winner reduction + value gather."""
    winner = _winner_reduce(write_cell, write_valid, g)
    gathered = jnp.take_along_axis(
        write_value, jnp.maximum(winner, 0)[..., None], axis=2
    )
    return jnp.where(
        (winner >= 0)[..., None], gathered,
        jnp.asarray(constant, dtype=write_value.dtype),
    )


def _lastwrite_argmax_matmul(write_cell, write_value, write_valid, constant, g):
    """Fused winner reduction + MXU one-hot contraction for the values:
    grid[s,i,g,:] = sum_j (winner[s,i,g]==j) * write_value[s,i,j,:] — a
    [G, A] x [A, D] batched matmul.  HIGHEST precision keeps the multiply
    by an exact 0/1 one-hot bit-exact in f32 (each product is v or 0 and the
    additions of zeros are exact)."""
    winner = _winner_reduce(write_cell, write_valid, g)
    a = write_cell.shape[2]
    j_iota = jnp.arange(a, dtype=jnp.int32)
    onehot = (winner[:, :, None, :] == j_iota[None, None, :, None]).astype(
        write_value.dtype
    )  # [S, A, A(j), G]
    grid = jnp.einsum(
        "sajg,sajd->sagd", onehot, write_value,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.where(
        (winner >= 0)[..., None], grid,
        jnp.asarray(constant, dtype=write_value.dtype),
    )


def _lastwrite_argmax_sum(write_cell, write_value, write_valid, constant, g):
    """Fused winner reduction + fused select-sum for the values.

    Like _lastwrite_argmax_matmul but the one-hot contraction is a masked
    sum-reduction over j instead of an einsum: XLA fuses the broadcast
    compare and select into the reduce loop, so the [S, A, A, G(, D)]
    intermediates never materialize in HBM (the einsum's one-hot operand is
    ~1 GB per step at A=32, S=2048 — pure HBM-bandwidth waste for a D=2
    contraction the MXU can't fill anyway).  Exact: each (s,i,g,d) sums one
    surviving value and zeros."""
    winner = _winner_reduce(write_cell, write_valid, g)
    a = write_cell.shape[2]
    j_iota = jnp.arange(a, dtype=jnp.int32)
    eq = winner[:, :, None, :] == j_iota[None, None, :, None]  # [S,A,A,G]
    grid = jnp.sum(
        jnp.where(eq[..., None], write_value[:, :, :, None, :],
                  jnp.zeros((), dtype=write_value.dtype)),
        axis=2,
    )
    return jnp.where(
        (winner >= 0)[..., None], grid,
        jnp.asarray(constant, dtype=write_value.dtype),
    )


_SCATTER_IMPLS = {
    "chain": _lastwrite_chain,
    "scatter_max": _lastwrite_scatter_max,
    "argmax_gather": _lastwrite_argmax_gather,
    "argmax_matmul": _lastwrite_argmax_matmul,
    "argmax_sum": _lastwrite_argmax_sum,
}


class GridBasedPooling:
    """Static configuration for grid pooling; parameters live in a pytree."""

    # class-level default so checkpoints pickled before this attribute
    # existed keep loading (predictor pickles are the distribution format,
    # utils/checkpoint.py; unpickling bypasses __init__)
    scatter_impl: Optional[str] = None

    def __init__(
        self,
        type_: str = "occupancy",
        hidden_dim: int = 128,
        cell_side: float = 2.0,
        n: int = 4,
        out_dim: Optional[int] = None,
        pool_size: int = 1,
        blur_size: int = 1,
        front: bool = False,
        embedding_arch: str = "one_layer",
        constant: float = 0.0,
        norm: int = 0,
        layer_dims: Optional[list] = None,
        latent_dim: int = 16,
    ):
        assert type_ in ("occupancy", "directional", "social", "dir_social")
        self.type_ = type_
        self.hidden_dim = hidden_dim
        self.cell_side = cell_side
        self.n = n
        self.pool_size = pool_size
        self.blur_size = blur_size
        self.front = front
        self.constant = float(constant)
        self.norm = norm
        self.latent_dim = latent_dim
        self.embedding_arch = embedding_arch
        self.layer_dims = list(layer_dims) if layer_dims else [512]

        self.pooling_dim = 1
        if type_ == "directional":
            self.pooling_dim = 2
        elif type_ == "social":
            self.pooling_dim = latent_dim
        elif type_ == "dir_social":
            self.pooling_dim = latent_dim + 2

        self.out_dim = out_dim if out_dim is not None else hidden_dim
        self.grid_dim = self.n * self.n * self.pooling_dim
        self.stateful = embedding_arch == "lstm_layer"
        # None -> per-A heuristic in make_grid; set to one of _SCATTER_IMPLS
        # to force an implementation (benchmarks, tests)
        self.scatter_impl: Optional[str] = None

    # ---------------------------------------------------------------- params
    def init_params(self, key) -> Dict:
        keys = jax.random.split(key, 4)
        params: Dict = {}
        if self.type_ in ("social", "dir_social"):
            params["hidden_dim_encoding"] = init_linear(keys[0], self.hidden_dim, self.latent_dim)

        arch = self.embedding_arch
        if arch == "one_layer":
            params["embedding"] = init_mlp(keys[1], [self.grid_dim, self.out_dim])
        elif arch == "two_layer":
            params["embedding"] = init_mlp(keys[1], [self.grid_dim, self.layer_dims[0], self.out_dim])
        elif arch == "three_layer":
            params["embedding"] = init_mlp(
                keys[1], [self.grid_dim, self.layer_dims[0], self.layer_dims[1], self.out_dim]
            )
        elif arch == "lstm_layer":
            params["embedding"] = init_mlp(keys[1], [self.grid_dim, self.out_dim])
            params["pool_lstm"] = init_lstm_cell(keys[2], self.out_dim, self.hidden_dim)
            params["hidden2pool"] = init_linear(keys[3], self.hidden_dim, self.out_dim)
        elif arch == "None":
            pass
        else:
            raise ValueError(f"unknown embedding_arch {arch!r}")
        return params

    def init_state(self, num_scenes: int, num_agents: int):
        if not self.stateful:
            return None
        shape = (num_scenes, num_agents, self.hidden_dim)
        return (jnp.zeros(shape), jnp.zeros(shape))

    @property
    def position_only(self) -> bool:
        """True when apply() is a pure function of positions/masks.

        occupancy/directional grids read neither the LSTM hidden state nor
        any pool state (unless the stateful lstm_layer encoder is on), so a
        whole observation phase can be pooled in ONE batched dispatch with
        time folded into the scene axis (models/lstm.py encode) — identical
        math, MXU-friendlier shapes."""
        return self.type_ in ("occupancy", "directional") and not self.stateful

    # ----------------------------------------------------------------- grids
    def _grid_values(self, hidden, obs1, obs2, present1, present2, params):
        """Per-pair fill values [S, A, A, D] and their validity [S, A, A]."""
        s, a = obs2.shape[:2]
        if self.type_ == "occupancy":
            values = jnp.ones((s, a, a, 1), obs2.dtype)
            return values

        vel_valid = (present1 & present2)[..., None]  # [S, A, 1]
        vel = (obs2 - obs1) * vel_valid
        # relative velocity of j wrt i; zero when either velocity is invalid
        rel_vel = (vel[:, None, :, :] - vel[:, :, None, :]) * (
            vel_valid[:, None, :, 0] & vel_valid[:, :, None, 0]
        )[..., None]

        if self.type_ == "directional":
            return rel_vel

        hidden_enc = linear(params["hidden_dim_encoding"], hidden)  # [S, A, latent]
        hidden_grid = jnp.broadcast_to(
            hidden_enc[:, None, :, :], (s, a, a, self.latent_dim)
        )
        if self.type_ == "social":
            return hidden_grid
        return jnp.concatenate([rel_vel, hidden_grid], axis=-1)  # dir_social

    def make_grid(self, hidden, obs1, obs2, present1, present2, params) -> jnp.ndarray:
        """Build the pooled grid tensor [S, A, D, n, n]."""
        s, a = obs2.shape[:2]
        nps = self.n * self.pool_size
        g = nps * nps

        values = self._grid_values(hidden, obs1, obs2, present1, present2, params)
        d = values.shape[-1]

        rel = obs2[:, None, :, :] - obs2[:, :, None, :]  # rel[s, i, j] = pos_j - pos_i
        if self.front:
            offset = jnp.array([nps / 2.0, 0.0], obs2.dtype)
        else:
            offset = jnp.array([nps / 2.0, nps / 2.0], obs2.dtype)
        oij = rel / (self.cell_side / self.pool_size) + offset

        visible = present2[:, None, :] & present2[:, :, None]  # both ends observed at t
        not_self = ~jnp.eye(a, dtype=bool)[None]
        in_range = jnp.all((oij >= 0) & (oij < nps), axis=-1) & visible & not_self

        cell = jnp.floor(oij).astype(jnp.int32)
        flat_cell = cell[..., 0] * nps + cell[..., 1]
        write_cell = jnp.where(in_range, flat_cell, 0)  # out-of-range -> cell 0
        write_value = jnp.where(in_range[..., None], values, self.constant)
        write_valid = not_self  # every non-self neighbour writes (maybe constant@0)

        # Implementation choice (all bit-identical, tests/test_grid_scatter.py),
        # picked per A from the v5e rollout sweep (scripts/bench_grid_scatter.py):
        # - chain (A<=16): unrolled selects fuse best, but the graph grows
        #   O(A) and its compile blows up past ~16;
        # - argmax_sum (17..64): fused winner reduction + fused select-sum,
        #   O(1)-graph, no scatter/gather, nothing [S,A,A,G]-shaped in HBM.
        #   A=32: 26,048 scenes/s vs 908 for the old runtime scatter-max
        #   (TPU serializes scatter updates; take_along_axis gathers are
        #   nearly as bad at 1.1k);
        # - argmax_matmul (A>64): the j-contraction is wide enough that the
        #   MXU one-hot matmul beats the VPU select-sum (A=128: 1,899 vs
        #   1,521 scenes/s).
        if self.scatter_impl:
            impl = self.scatter_impl
        elif a <= 16:
            impl = "chain"
        elif a <= 64:
            impl = "argmax_sum"
        else:
            impl = "argmax_matmul"
        grid = _SCATTER_IMPLS[impl](write_cell, write_value, write_valid, self.constant, g)

        # channel-major layout matching the reference's transpose+view
        grid2d = grid.reshape(s, a, nps, nps, d)
        grid2d = jnp.moveaxis(grid2d, -1, 2)  # [S, A, D, nps, nps]

        if self.blur_size > 1:
            pad = int(self.blur_size / 2)
            summed = jax.lax.reduce_window(
                grid2d,
                0.0,
                jax.lax.add,
                window_dimensions=(1, 1, 1, self.blur_size, self.blur_size),
                window_strides=(1, 1, 1, 1, 1),
                padding=((0, 0), (0, 0), (0, 0), (pad, pad), (pad, pad)),
            )
            # torch avg_pool2d keeps spatial dims with this padding only when
            # blur is odd; even blurs grow the map by 1 like the reference
            grid2d = summed / float(self.blur_size ** 2)

        if self.pool_size > 1:
            grid2d = jax.lax.reduce_window(
                grid2d,
                0.0,
                jax.lax.add,
                window_dimensions=(1, 1, 1, self.pool_size, self.pool_size),
                window_strides=(1, 1, 1, self.pool_size, self.pool_size),
                padding="VALID",
            )
        return grid2d

    # ----------------------------------------------------------------- apply
    def apply(
        self,
        params: Dict,
        state,
        hidden: jnp.ndarray,
        obs1: jnp.ndarray,
        obs2: jnp.ndarray,
        present1: jnp.ndarray,
        present2: jnp.ndarray,
        slot_mask: jnp.ndarray = None,
    ) -> Tuple[jnp.ndarray, object]:
        s, a = obs2.shape[:2]
        grid = self.make_grid(hidden, obs1, obs2, present1, present2, params)
        flat = grid.reshape(s, a, -1)

        if self.embedding_arch == "None":
            return flat, state
        emb = mlp(params["embedding"], flat)
        if not self.stateful:
            return emb, state

        # stateful lstm_layer encoder — the documented intent of the
        # reference's (dead, never-invoked) lstm_forward
        # (gridbased_pooling.py:353-379): only tracks participating in the
        # step update their interaction-LSTM state, and a step with <=1
        # participating track contributes zeros and freezes all state.
        vis = present1 & present2
        if slot_mask is not None:
            vis = vis & slot_mask
        multi = jnp.sum(vis, axis=1, keepdims=True) > 1  # [S, 1]
        upd = (vis & multi)[..., None]

        h, c = state
        h_new, c_new = lstm_cell(params["pool_lstm"], emb, (h, c))
        h_new = jnp.where(upd, h_new, h)
        c_new = jnp.where(upd, c_new, c)
        out = linear(params["hidden2pool"], h_new) * multi[..., None]
        return out, (h_new, c_new)
