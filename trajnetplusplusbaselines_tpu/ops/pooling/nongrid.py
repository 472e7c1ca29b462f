"""Non-grid interaction pooling modules.

Behavioural mirrors of /root/reference/trajnetbaselines/lstm/non_gridbased_pooling.py:64-538
on dense ``[scene, agent, ...]`` batches.  The reference's NaN bookkeeping
(``embed_with_masking`` fill values, nan_to_num, dummy distances) becomes
explicit masks:

- ``present1/present2 [S, A]``: agent observed at t-1 / t
- ``slot_mask [S, A]``: the slot is a real track of the scene (padding slots
  mirror the reference's NaN placeholder rows)

All pools return ``[S, A, out_dim]``; the step engine discards rows of
non-participating agents.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import init_linear, init_lstm_cell, linear, lstm_cell


def rel_obs(obs: jnp.ndarray) -> jnp.ndarray:
    """rel[s, i, j] = obs[j] - obs[i]; pairwise relative positions."""
    return obs[:, None, :, :] - obs[:, :, None, :]


def rel_directional(obs1: jnp.ndarray, obs2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise relative velocities."""
    vel = obs2 - obs1
    return vel[:, None, :, :] - vel[:, :, None, :]


def _masked_fill(values: jnp.ndarray, valid: jnp.ndarray, fill: float) -> jnp.ndarray:
    return jnp.where(valid[..., None], values, fill)


class HiddenStateMLPPooling:
    """S-GAN pooling: elementwise max over embedded neighbour attributes.

    The reference embeds relative positions (fill -100 where either agent is
    unobserved), per-agent hidden states (fill -100 for placeholder slots) and
    x4-scaled relative velocities, concatenates and max-pools over neighbours
    (self included), then projects.
    """

    stateful = False

    def __init__(self, hidden_dim=128, mlp_dim=128, mlp_dim_spatial=32, mlp_dim_vel=32,
                 out_dim=None, fill_value=-100.0):
        self.hidden_dim = hidden_dim
        self.mlp_dim = mlp_dim
        self.mlp_dim_spatial = mlp_dim_spatial
        self.mlp_dim_vel = mlp_dim_vel
        self.mlp_dim_hidden = mlp_dim - mlp_dim_spatial - mlp_dim_vel
        self.out_dim = out_dim or hidden_dim
        self.fill_value = fill_value

    def init_params(self, key) -> Dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {"spatial": init_linear(k1, 2, self.mlp_dim_spatial)}
        if self.mlp_dim_vel:
            params["vel"] = init_linear(k2, 2, self.mlp_dim_vel)
        if self.mlp_dim_hidden:
            params["hidden"] = init_linear(k3, self.hidden_dim, self.mlp_dim_hidden)
        params["out"] = init_linear(k4, self.mlp_dim, self.out_dim)
        return params

    def init_state(self, num_scenes, num_agents):
        return None

    def _embedded(self, params, hidden, obs1, obs2, present1, present2, slot_mask,
                  spatial_fill, hidden_fill, vel_fill):
        s, a = obs2.shape[:2]
        pos_valid = present2[:, None, :] & present2[:, :, None]  # [S, i, j]
        spatial = jax.nn.relu(linear(params["spatial"], rel_obs(obs2 * present2[..., None])))
        parts = [_masked_fill(spatial, pos_valid, spatial_fill)]

        if self.mlp_dim_hidden:
            h_emb = jax.nn.relu(linear(params["hidden"], hidden))
            h_emb = _masked_fill(h_emb, slot_mask, hidden_fill)  # [S, j, dh]
            parts.append(jnp.broadcast_to(h_emb[:, None, :, :], (s, a, a, self.mlp_dim_hidden)))

        if self.mlp_dim_vel:
            vel_ok = present1 & present2
            vel = (obs2 - obs1) * vel_ok[..., None]
            rv = vel[:, None, :, :] - vel[:, :, None, :]
            vel_valid = vel_ok[:, None, :] & vel_ok[:, :, None]
            vel_emb = jax.nn.relu(linear(params["vel"], rv * 4.0))
            parts.append(_masked_fill(vel_emb, vel_valid, vel_fill))

        return jnp.concatenate(parts, axis=-1)  # [S, i, j, mlp_dim]

    def apply(self, params, state, hidden, obs1, obs2, present1, present2, slot_mask
              ) -> Tuple[jnp.ndarray, object]:
        embedded = self._embedded(
            params, hidden, obs1, obs2, present1, present2, slot_mask,
            self.fill_value, self.fill_value, self.fill_value,
        )
        pooled = jnp.max(embedded, axis=2)  # over neighbours j (self included)
        return linear(params["out"], pooled), state


class AttentionMLPPooling(HiddenStateMLPPooling):
    """S-BiGAT pooling: single-head attention over neighbour embeddings.

    The reference runs torch MultiheadAttention after extra q/k/v linears and
    keeps only each agent's own (diagonal) attention row — so only the query
    at position i matters, which this implementation exploits directly (the
    dense [A, A] attention of the reference collapses to one query per agent,
    an exact algebraic simplification).

    ``logit_cap`` (off by default — the reference has no analogue, and
    parity tests run uncapped) applies ``cap * tanh(logits / cap)`` before
    the softmax.  Training-stability fix for the instability diagnosed in
    RESULTS.md: per-leaf gradient traces show the rare >>1e4-norm steps
    land almost entirely on the score path (spatial/hidden/vel embeddings,
    wk/wq) while the value path stays at healthy norms — i.e. the loss
    becomes hypersensitive to *which* neighbour wins the softmax as |q|·|k|
    grows unchecked.  The tanh cap bounds the logits AND multiplies their
    gradient by tanh' -> 0 in saturation, breaking the feedback loop while
    leaving the small-logit (healthy) regime numerically unchanged.
    """

    stateful = False

    def __init__(self, hidden_dim=128, mlp_dim=128, mlp_dim_spatial=32, mlp_dim_vel=32,
                 out_dim=None, fill_value=-10.0, logit_cap=None):
        super().__init__(hidden_dim, mlp_dim, mlp_dim_spatial, mlp_dim_vel, out_dim, fill_value)
        self.logit_cap = logit_cap

    def init_params(self, key) -> Dict:
        keys = jax.random.split(key, 9)
        params = super().init_params(keys[0])
        e = self.mlp_dim
        params["wq"] = init_linear(keys[1], e, e, bias=False)
        params["wk"] = init_linear(keys[2], e, e, bias=False)
        params["wv"] = init_linear(keys[3], e, e, bias=False)
        # torch MultiheadAttention internals: in_proj for q/k/v + out_proj
        params["in_q"] = init_linear(keys[4], e, e)
        params["in_k"] = init_linear(keys[5], e, e)
        params["in_v"] = init_linear(keys[6], e, e)
        params["attn_out"] = init_linear(keys[7], e, e)
        return params

    def apply(self, params, state, hidden, obs1, obs2, present1, present2, slot_mask
              ) -> Tuple[jnp.ndarray, object]:
        embedded = self._embedded(
            params, hidden, obs1, obs2, present1, present2, slot_mask,
            self.fill_value, 0.0, self.fill_value,
        )  # [S, i, j, E]
        s, a = embedded.shape[:2]

        diag = jnp.einsum("siid->sid", embedded)  # agent i's own row (query)
        q = linear(params["in_q"], linear(params["wq"], diag))  # [S, A, E]
        k = linear(params["in_k"], linear(params["wk"], embedded))  # [S, A, A, E]
        v = linear(params["in_v"], linear(params["wv"], embedded))

        scale = 1.0 / jnp.sqrt(jnp.asarray(self.mlp_dim, q.dtype))
        logits = jnp.einsum("sie,sije->sij", q, k) * scale
        if getattr(self, "logit_cap", None):
            cap = jnp.asarray(self.logit_cap, logits.dtype)
            logits = cap * jnp.tanh(logits / cap)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("sij,sije->sie", attn, v)
        ctx = linear(params["attn_out"], ctx)
        return linear(params["out"], ctx), state


def _nearest_grid(obs1, obs2, present1, present2, n: int) -> jnp.ndarray:
    """Top-n nearest neighbour attributes [S, A, n, 4] (rel pos ++ rel vel).

    Invalid or missing neighbours become zero rows exactly like the
    reference's dummy-distance + nan_to_num pipeline.
    """
    s, a = obs2.shape[:2]
    pos_valid = present2[:, None, :] & present2[:, :, None]
    rel_pos = rel_obs(obs2 * present2[..., None]) * pos_valid[..., None]

    vel_ok = present1 & present2
    vel = (obs2 - obs1) * vel_ok[..., None]
    vel_valid = vel_ok[:, None, :] & vel_ok[:, :, None]
    rel_vel = (vel[:, None, :, :] - vel[:, :, None, :]) * vel_valid[..., None]

    grid = jnp.concatenate([rel_pos, rel_vel], axis=-1)  # [S, i, j, 4]

    dist = jnp.linalg.norm(rel_pos, axis=-1)
    dist = jnp.where(pos_valid, dist, 1000.0)  # dummy distance for unobserved
    dist = jnp.where(jnp.eye(a, dtype=bool)[None], 1e9, dist)  # never self

    k = min(n, a)
    neg_dist, idx = jax.lax.top_k(-dist, k)  # nearest k per (s, i)
    sel_dist = -neg_dist  # [S, A, k]
    gathered = jnp.take_along_axis(grid, idx[..., None], axis=2)  # [S, A, k, 4]
    gathered = jnp.where(sel_dist[..., None] < 1000.0, gathered, 0.0)

    if k < n:  # zero-pad to n slots (tiny scenes)
        pad = jnp.zeros((s, a, n - k, 4), gathered.dtype)
        gathered = jnp.concatenate([gathered, pad], axis=2)
    return gathered


class NearestNeighborMLP:
    """Concatenated embeddings of the top-n nearest neighbours."""

    stateful = False
    # pure function of positions/masks: eligible for the batched
    # observation-phase fold (models/lstm.py encode)
    position_only = True

    def __init__(self, n=4, out_dim=32, no_vel=False):
        self.n = n
        self.out_dim = out_dim
        self.no_velocity = no_vel
        self.input_dim = 2 if no_vel else 4

    def init_params(self, key) -> Dict:
        return {"embedding": init_linear(key, self.input_dim, self.out_dim // self.n)}

    def init_state(self, num_scenes, num_agents):
        return None

    def apply(self, params, state, hidden, obs1, obs2, present1, present2, slot_mask
              ) -> Tuple[jnp.ndarray, object]:
        s, a = obs2.shape[:2]
        nearest = _nearest_grid(obs1, obs2, present1, present2, self.n)
        if self.no_velocity:
            nearest = nearest[..., :2]
        emb = jax.nn.relu(linear(params["embedding"], nearest))  # [S, A, n, out/n]
        return emb.reshape(s, a, -1), state


class NearestNeighborLSTM:
    """Top-n neighbour embedding fed through a per-agent interaction LSTM."""

    stateful = True

    def __init__(self, n=4, hidden_dim=256, out_dim=32):
        self.n = n
        self.hidden_dim = hidden_dim
        self.out_dim = out_dim
        self.input_dim = 4

    def init_params(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "embedding": init_linear(k1, self.input_dim, self.out_dim // self.n),
            "pool_lstm": init_lstm_cell(k2, self.out_dim, self.hidden_dim),
            "hidden2pool": init_linear(k3, self.hidden_dim, self.out_dim),
        }

    def init_state(self, num_scenes, num_agents):
        shape = (num_scenes, num_agents, self.hidden_dim)
        return (jnp.zeros(shape), jnp.zeros(shape))

    def apply(self, params, state, hidden, obs1, obs2, present1, present2, slot_mask
              ) -> Tuple[jnp.ndarray, object]:
        s, a = obs2.shape[:2]
        nearest = _nearest_grid(obs1, obs2, present1, present2, self.n)
        emb = jax.nn.relu(linear(params["embedding"], nearest)).reshape(s, a, -1)
        # the reference updates the interaction LSTM for every track each step
        h, c = state
        h_new, c_new = lstm_cell(params["pool_lstm"], emb, (h, c))
        return linear(params["hidden2pool"], h_new), (h_new, c_new)


class TrajectronPooling:
    """Sum-pooled absolute states through an interaction LSTM (Trajectron)."""

    stateful = True

    def __init__(self, n=4, hidden_dim=256, out_dim=32):
        self.n = n
        self.hidden_dim = hidden_dim
        self.out_dim = out_dim

    def init_params(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "embedding": init_linear(k1, 8, self.out_dim),
            "pool_lstm": init_lstm_cell(k2, self.out_dim, self.hidden_dim),
            "hidden2pool": init_linear(k3, self.hidden_dim, self.out_dim),
        }

    def init_state(self, num_scenes, num_agents):
        shape = (num_scenes, num_agents, self.hidden_dim)
        return (jnp.zeros(shape), jnp.zeros(shape))

    def apply(self, params, state, hidden, obs1, obs2, present1, present2, slot_mask
              ) -> Tuple[jnp.ndarray, object]:
        s, a = obs2.shape[:2]
        vis = present1 & present2  # states need both pos and vel
        vel = (obs2 - obs1) * vis[..., None]
        pos = obs2 * vis[..., None]
        states = jnp.concatenate([pos, vel], axis=-1)  # [S, A, 4]
        total = jnp.sum(states * vis[..., None], axis=1, keepdims=True)  # [S, 1, 4]
        others = (total - states) * vis[..., None]
        neigh = jnp.concatenate([states, others], axis=-1)  # [S, A, 8]
        emb = jax.nn.relu(linear(params["embedding"], neigh))
        emb = emb * vis[..., None]  # invisible agents feed zeros, like the reference

        h, c = state
        h_new, c_new = lstm_cell(params["pool_lstm"], emb, (h, c))
        return linear(params["hidden2pool"], h_new), (h_new, c_new)


class NMMP:
    """Neural message passing over agent hidden-state embeddings (NMMP, CVPR'20).

    Mirror of /root/reference/trajnetbaselines/lstm/more_non_gridbased_pooling.py:5-79.
    The upstream module is stale (its ``message_pass`` assumes a per-scene 2-D
    ``[n, d]`` input but the trainer-side pooling interface feeds padded 3-D
    ``[scene, agent, d]`` tensors with NaN placeholder rows, so it cannot run
    as wired); this is the repaired dense formulation of the same algorithm:
    per scene, k rounds of node->edge->node message passing where edge means
    run over the tracks participating in the step (present at t-1 and t,
    self excluded), and scenes with <=1 participating track return zeros like
    the reference's ``num_tracks == 1`` early exit (:70-72).
    """

    stateful = False

    def __init__(self, hidden_dim=128, mlp_dim=32, k=5, out_dim=None):
        self.hidden_dim = hidden_dim
        self.mlp_dim = mlp_dim
        self.k = k
        self.out_dim = out_dim or hidden_dim

    def init_params(self, key) -> Dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "hidden_embedding": init_linear(k1, self.hidden_dim, self.mlp_dim),
            "node_to_edge": init_linear(k2, 2 * self.mlp_dim, self.mlp_dim),
            "edge_to_node": init_linear(k3, 2 * self.mlp_dim, self.mlp_dim),
            "out": init_linear(k4, self.mlp_dim, self.out_dim),
        }

    def init_state(self, num_scenes, num_agents):
        return None

    def apply(self, params, state, hidden, obs1, obs2, present1, present2, slot_mask
              ) -> Tuple[jnp.ndarray, object]:
        a = hidden.shape[1]
        node = jax.nn.relu(linear(params["hidden_embedding"], hidden))  # [S, A, m]

        vis = present1 & present2 & slot_mask  # tracks participating in the step
        pair_valid = vis[:, None, :] & vis[:, :, None]
        pair_valid = pair_valid & ~jnp.eye(a, dtype=bool)[None]  # j != i
        count = jnp.sum(pair_valid, axis=2, keepdims=True)  # [S, A, 1]
        denom = jnp.maximum(count, 1)

        # The edge MLP is linear, so the [S, A, A, 2m] pairwise tensor the
        # naive form materializes (the ensemble trainer's HBM-OOM root cause,
        # registry.log round 4) never needs to exist:
        #   e_out(i,j) = linear([n_i; n_j]) = n_i@Wa + n_j@Wb + bias
        # and its pair_valid-masked mean over j decomposes into per-node
        # matmuls plus one [A, A] x [A, m] contraction on the MXU.  Same
        # semantics as the dense form (tests/test_nmmp.py pins the values).
        w = params["node_to_edge"]["w"]  # [2m, m]
        bias = params["node_to_edge"]["b"]
        wa, wb = w[: self.mlp_dim], w[self.mlp_dim :]
        pv = pair_valid.astype(node.dtype)  # [S, A, A]
        has_neigh = jnp.where(count > 0, 1.0, 0.0).astype(node.dtype)
        for _ in range(self.k):
            pa = node @ wa  # [S, A, m]
            pb = node @ wb
            neigh_pa = jnp.einsum("sij,sjm->sim", pv, pa) / denom
            neigh_pb = jnp.einsum("sij,sjm->sim", pv, pb) / denom
            e_out = (pa + bias) * has_neigh + neigh_pb
            e_in = (pb + bias) * has_neigh + neigh_pa
            node = linear(params["edge_to_node"], jnp.concatenate([e_in, e_out], axis=-1))

        # scenes with <=1 participating track produce no interaction (the
        # reference returns zeros for num_tracks == 1)
        multi = jnp.sum(vis, axis=1, keepdims=True) > 1  # [S, 1]
        return linear(params["out"], node) * multi[..., None], state
