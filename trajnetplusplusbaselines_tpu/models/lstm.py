"""LSTM trajectory forecaster: dense masked scan over time.

TPU-native re-design of /root/reference/trajnetbaselines/lstm/lstm.py:45-313.
The reference keeps a Python list of per-track hidden states and rebuilds
masked stacks every timestep; here one step is a pure function over
``[scene, agent, ...]`` tensors and time runs under ``jax.lax.scan``:

- ``track participation`` (present at t-1 AND t, lstm.py:118) becomes a
  boolean mask; hidden states update through ``jnp.where`` so non-participants
  keep their state and receive no gradient, matching the reference's masked
  scatter exactly.
- NaN outputs for absent tracks become (value, valid) pairs; NaN only exists
  at the I/O edges.
- teacher forcing feeds ground-truth neighbours but the model's own
  ``stop_gradient``-ed prediction for the primary (lstm.py:240-250); at test
  time every track autoregresses from the model's own positions.

Shapes: obs [T, S, A, 2]; masks [T, S, A]; goals [S, A, 2]; outputs
(rel_pred [T', S, A, 5], pred [T', S, A, 2], valid [T', S, A]) with
T' = (T_obs - 1) + (pred_length - 1), of which the trailing ``pred_length``
entries are the prediction window (the encoder contributes the first
predicted frame, lstm.py:197-200).
"""

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.core import init_lstm_cell, lstm_cell
from ..ops.embeddings import (
    hidden2normal,
    init_hidden2normal,
    init_input_embedding,
    input_embedding,
)


class StepCarry(NamedTuple):
    h: jnp.ndarray  # [S, A, H]
    c: jnp.ndarray  # [S, A, H]
    pool_state: object  # pool-specific pytree or None


class LSTM:
    """Static model configuration; parameters live in a pytree."""

    # class-level default (old pickles bypass __init__): unroll factor for
    # the time scans.  The rollout is 20 sequential small fused programs —
    # the roofline's binding constraint (RESULTS.md) — and unrolling gives
    # XLA a wider fusion/overlap window per program at zero semantic change.
    scan_unroll: int = 1

    def __init__(
        self,
        embedding_dim: int = 64,
        hidden_dim: int = 128,
        pool=None,
        pool_to_input: bool = True,
        goal_dim: Optional[int] = None,
        goal_flag: bool = False,
    ):
        self.embedding_dim = embedding_dim
        self.hidden_dim = hidden_dim
        self.pool = pool
        self.pool_to_input = pool_to_input
        self.goal_flag = goal_flag
        self.goal_dim = goal_dim or embedding_dim
        # compute dtype for the recurrence state; None follows the ambient
        # default (f32, or f64 under jax_enable_x64); bfloat16 roughly doubles
        # MXU throughput at a small accuracy cost (set via `with_dtype`)
        self.compute_dtype = None
        # rematerialize each recurrence step in the backward pass
        # (jax.checkpoint on the scan bodies): activations of the 20-step
        # rollout are recomputed instead of stored, cutting peak HBM ~T-fold
        # for attention pools whose [S,A,A,E] step activations dominate
        # (the 5-member vmapped attentionmlp ensemble OOMs 24.6G/15.75G
        # without it).  Value- and gradient-neutral (tests/test_remat.py)
        self.remat = False

        goal_rep = self.goal_dim if goal_flag else 0
        pooling_dim = pool.out_dim if (pool is not None and pool_to_input) else 0
        self.input_dim = embedding_dim + goal_rep + pooling_dim

    def with_dtype(self, dtype):
        self.compute_dtype = dtype
        return self

    # ---------------------------------------------------------------- params
    def init_params(self, key) -> Dict:
        keys = jax.random.split(key, 6)
        params = {
            "input_embedding": init_input_embedding(keys[0], 2, self.embedding_dim),
            "goal_embedding": init_input_embedding(keys[1], 2, self.goal_dim),
            "encoder": init_lstm_cell(keys[2], self.input_dim, self.hidden_dim),
            "decoder": init_lstm_cell(keys[3], self.input_dim, self.hidden_dim),
            "hidden2normal": init_hidden2normal(keys[4], self.hidden_dim),
        }
        if self.pool is not None:
            params["pool"] = self.pool.init_params(keys[5])
        return params

    def init_carry(self, num_scenes: int, num_agents: int) -> StepCarry:
        shape = (num_scenes, num_agents, self.hidden_dim)
        dt = getattr(self, "compute_dtype", None)
        pool_state = self.pool.init_state(num_scenes, num_agents) if self.pool else None
        if pool_state is not None and dt is not None:
            pool_state = jax.tree.map(lambda x: x.astype(dt), pool_state)
        return StepCarry(jnp.zeros(shape, dt), jnp.zeros(shape, dt), pool_state)

    # ------------------------------------------------------------------ step
    def step(
        self,
        params: Dict,
        cell_name: str,
        carry: StepCarry,
        obs1: jnp.ndarray,
        obs2: jnp.ndarray,
        present1: jnp.ndarray,
        present2: jnp.ndarray,
        goals: jnp.ndarray,
        slot_mask: jnp.ndarray,
        pooled: Optional[jnp.ndarray] = None,
    ) -> Tuple[StepCarry, jnp.ndarray, jnp.ndarray]:
        """One recurrence step. Returns (carry, normal [S,A,5], mask [S,A]).

        pooled: precomputed interaction features [S, A, p] for this step
        (position-only pools batched over the whole observation phase,
        encode()); None computes them here."""
        mask = present1 & present2  # participating tracks
        vel = (obs2 - obs1) * mask[..., None]
        inp = input_embedding(params["input_embedding"], vel)

        if self.goal_flag:
            diff = (obs2 - goals) * mask[..., None]
            norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
            direction = jnp.where(norm > 0, diff / jnp.where(norm > 0, norm, 1.0), 0.0)
            inp = jnp.concatenate(
                [inp, input_embedding(params["goal_embedding"], direction)], axis=-1
            )

        h, c, pool_state = carry
        if self.pool is not None:
            if pooled is None:
                pooled, pool_state = self.pool.apply(
                    params["pool"], pool_state, h, obs1, obs2, present1,
                    present2, slot_mask
                )
            if self.pool_to_input:
                inp = jnp.concatenate([inp, pooled], axis=-1)
            else:
                h = h + pooled * mask[..., None]

        h_new, c_new = lstm_cell(params[cell_name], inp, (h, c))
        normal = hidden2normal(params["hidden2normal"], h_new)

        m = mask[..., None]
        h = jnp.where(m, h_new, carry.h)
        c = jnp.where(m, c_new, carry.c)
        return StepCarry(h, c, pool_state), normal * m, mask

    # --------------------------------------------------------------- encoder
    def encode(self, params, carry, observed, observed_mask, goals, slot_mask):
        """Scan the encoder over observation transitions.

        Returns (carry, normals [T-1,S,A,5], masks [T-1,S,A], positions
        [T-1,S,A,2], position validity [T-1,S,A]).
        """

        # Position-only pools (directional/occupancy grids) read neither the
        # hidden state nor any pool state, so the WHOLE observation phase
        # pools in one batched dispatch with time folded into the scene axis
        # — identical values (tests/test_static_pool.py), but the grid
        # scatter + embedding MLP run as one (T-1)·S-row program instead of
        # T-1 small per-step programs trapped in the serial scan (measured
        # ceiling: docs/ceiling_proof_r5.jsonl).
        # Fold only while the batched grid tensor stays VMEM-friendly: at
        # (T-1)·S·A agent-rows beyond ~64k the materialized [rows, A, G, D]
        # intermediate spills the per-step VMEM working set into HBM and the
        # fold LOSES (measured at the S=131k bench shape: 311k vs 368k
        # scenes/s), while latency-bound shapes (training batch 8, eval
        # batch 64) gain ~20% (BENCH train_scenes_per_sec 23.7k -> 28.7k).
        pooled_seq = None
        fold_rows = (observed.shape[0] - 1) * observed.shape[1] * observed.shape[2]
        if (self.pool is not None and getattr(self.pool, "position_only", False)
                and fold_rows <= getattr(self, "pool_fold_limit", 65536)):
            tm1, s, a = observed.shape[0] - 1, observed.shape[1], observed.shape[2]

            def fold(x):
                return x.reshape((tm1 * s,) + x.shape[2:])

            pooled_all, _ = self.pool.apply(
                params["pool"], None, None,
                fold(observed[:-1]), fold(observed[1:]),
                fold(observed_mask[:-1]), fold(observed_mask[1:]),
                jnp.tile(slot_mask, (tm1, 1)),
            )
            pooled_seq = pooled_all.reshape(tm1, s, a, -1)

        def body(carry, inputs):
            obs1, obs2, p1, p2, pooled = inputs
            carry, normal, mask = self.step(
                params, "encoder", carry, obs1, obs2, p1, p2, goals, slot_mask,
                pooled=pooled,
            )
            position = (obs2 + normal[..., :2]) * mask[..., None]
            return carry, (normal, mask, position)

        if getattr(self, "remat", False):
            body = jax.checkpoint(body)
        inputs = (observed[:-1], observed[1:], observed_mask[:-1],
                  observed_mask[1:], pooled_seq)
        if pooled_seq is None:
            def body(carry, inputs, _inner=body):  # noqa: F811
                return _inner(carry, inputs + (None,))

            inputs = inputs[:4]
        carry, (normals, masks, positions) = jax.lax.scan(
            body, carry, inputs, unroll=getattr(self, "scan_unroll", 1)
        )
        return carry, normals, masks, positions, masks

    # --------------------------------------------------------------- decoder
    def decode(
        self,
        params,
        carry,
        pos_a,
        valid_a,
        pos_b,
        valid_b,
        goals,
        slot_mask,
        truth: Optional[jnp.ndarray],
        truth_mask: Optional[jnp.ndarray],
        n_steps: int,
    ):
        """Scan the decoder for n_steps.

        truth / truth_mask: [n_steps + 1, S, A, ...] ground-truth chain
        starting at the last observed frame (teacher forcing); None for full
        autoregression.  The primary (agent 0) always consumes the model's own
        detached prediction.
        """
        teacher = truth is not None

        def set_primary(gt_xy, gt_m, own_xy, own_m):
            own_xy = jax.lax.stop_gradient(own_xy)
            xy = gt_xy.at[:, 0, :].set(own_xy[:, 0, :])
            m = gt_m.at[:, 0].set(own_m[:, 0])
            return xy, m

        def body(state, inputs):
            carry, pos_a, valid_a, pos_b, valid_b = state
            if teacher:
                gt1, gm1, gt2, gm2 = inputs
                obs1, p1 = set_primary(gt1, gm1, pos_a, valid_a)
                obs2, p2 = set_primary(gt2, gm2, pos_b, valid_b)
            else:
                obs1, p1 = jax.lax.stop_gradient(pos_a), valid_a
                obs2, p2 = jax.lax.stop_gradient(pos_b), valid_b

            carry, normal, mask = self.step(
                params, "decoder", carry, obs1, obs2, p1, p2, goals, slot_mask
            )
            new_pos = (obs2 + normal[..., :2]) * mask[..., None]
            new_state = (carry, obs2, p2, new_pos, mask)
            return new_state, (normal, mask, new_pos)

        if getattr(self, "remat", False):
            body = jax.checkpoint(body)
        state = (carry, pos_a, valid_a, pos_b, valid_b)
        unroll = getattr(self, "scan_unroll", 1)
        if teacher:
            inputs = (truth[:-1], truth_mask[:-1], truth[1:], truth_mask[1:])
            state, (normals, masks, positions) = jax.lax.scan(
                body, state, inputs, unroll=unroll
            )
        else:
            state, (normals, masks, positions) = jax.lax.scan(
                body, state, None, length=n_steps, unroll=unroll
            )
        return state[0], normals, masks, positions, masks

    # --------------------------------------------------------------- forward
    def forward(
        self,
        params: Dict,
        observed: jnp.ndarray,
        observed_mask: jnp.ndarray,
        goals: jnp.ndarray,
        slot_mask: jnp.ndarray,
        prediction_truth: Optional[jnp.ndarray] = None,
        prediction_truth_mask: Optional[jnp.ndarray] = None,
        n_predict: Optional[int] = None,
    ):
        """Full rollout.

        prediction_truth(+mask): [pred_length - 1, S, A, 2] future frames for
        teacher forcing (training), or None with n_predict set (testing).

        Returns (rel_pred [T', S, A, 5], pred [T', S, A, 2], valid [T', S, A]).
        """
        assert (prediction_truth is None) != (n_predict is None)
        # promote inputs to the compute dtype (or the ambient default
        # float) so scan carries stay dtype-consistent when params and
        # data dtypes differ (e.g. f64 params under x64 tests)
        dt = getattr(self, "compute_dtype", None) or jnp.zeros(0).dtype  # getattr: older pickles lack the attr
        observed = jnp.asarray(observed, dt)
        goals = jnp.asarray(goals, dt)
        if prediction_truth is not None:
            prediction_truth = jnp.asarray(prediction_truth, dt)
        s, a = observed.shape[1], observed.shape[2]
        carry = self.init_carry(s, a)

        carry, enc_normals, enc_masks, enc_positions, enc_pos_valid = self.encode(
            params, carry, observed, observed_mask, goals, slot_mask
        )

        # positions[-2]/[-1] seed the decoder (lstm.py:240-250); with a
        # 2-frame observation the raw observation stands in for positions[-2].
        # The decoder's first obs1 is the last *observed* frame for every
        # neighbour (the chain starts at observed[-1]); only the primary lane
        # reads the model's own positions[-2] — in both teacher-forced and
        # autoregressive modes.
        if observed.shape[0] == 2:
            prim_a, prim_valid_a = observed[-1][:, 0], observed_mask[-1][:, 0]
        else:
            prim_a, prim_valid_a = enc_positions[-2][:, 0], enc_pos_valid[-2][:, 0]
        pos_a = observed[-1].at[:, 0].set(prim_a)
        valid_a = observed_mask[-1].at[:, 0].set(prim_valid_a)
        pos_b, valid_b = enc_positions[-1], enc_pos_valid[-1]

        if prediction_truth is not None:
            chain = jnp.concatenate([observed[-1:], prediction_truth], axis=0)
            chain_mask = jnp.concatenate([observed_mask[-1:], prediction_truth_mask], axis=0)
            n_steps = chain.shape[0] - 1
        else:
            chain, chain_mask = None, None
            n_steps = n_predict - 1

        carry, dec_normals, dec_masks, dec_positions, dec_pos_valid = self.decode(
            params, carry, pos_a, valid_a, pos_b, valid_b, goals, slot_mask,
            chain, chain_mask, n_steps,
        )

        rel_pred = jnp.concatenate([enc_normals, dec_normals], axis=0)
        pred = jnp.concatenate([enc_positions, dec_positions], axis=0)
        valid = jnp.concatenate([enc_masks, dec_masks], axis=0)
        return rel_pred, pred, valid

    def forward_stepwise(
        self,
        params: Dict,
        observed: jnp.ndarray,
        observed_mask: jnp.ndarray,
        goals: jnp.ndarray,
        slot_mask: jnp.ndarray,
        n_predict: int = 12,
        jit_cache: Optional[Dict] = None,
    ):
        """forward(n_predict=...) with Python-driven steps: one jitted *step*
        program per cell instead of one jitted whole-rollout scan.

        Numerically identical to forward (same self.step, same decoder
        seeding); only the execution strategy differs.  Exists because the
        remote chipless AOT compiler cannot schedule the scanned rollout of
        two_layer grid embeddings into VMEM (S-LSTM eval: 30+ min compile,
        then OOM), while the single step compiles in ~3 min and dispatches in
        ~2 ms.  The evaluator routes such configs here (learned.py).
        """
        dt = getattr(self, "compute_dtype", None) or jnp.zeros(0).dtype
        observed = jnp.asarray(observed, dt)
        goals = jnp.asarray(goals, dt)
        s, a = observed.shape[1], observed.shape[2]
        carry = self.init_carry(s, a)
        cache = jit_cache if jit_cache is not None else {}

        def step_fn(cell_name):
            # params are an argument, not a closure constant, so the compiled
            # step is weight-independent and shared across seeds (in-process
            # and through the persistent compile cache)
            if cell_name not in cache:
                def one(params, carry, obs1, obs2, p1, p2, goals, slot_mask):
                    carry, normal, mask = self.step(
                        params, cell_name, carry, obs1, obs2, p1, p2, goals,
                        slot_mask,
                    )
                    position = (obs2 + normal[..., :2]) * mask[..., None]
                    return carry, normal, mask, position
                cache[cell_name] = jax.jit(one)
            return cache[cell_name]

        enc = step_fn("encoder")
        enc_normals, enc_masks, enc_positions = [], [], []
        for t in range(observed.shape[0] - 1):
            carry, normal, mask, position = enc(
                params, carry, observed[t], observed[t + 1],
                observed_mask[t], observed_mask[t + 1], goals, slot_mask,
            )
            enc_normals.append(normal)
            enc_masks.append(mask)
            enc_positions.append(position)

        # decoder seeding identical to forward()
        if observed.shape[0] == 2:
            prim_a, prim_valid_a = observed[-1][:, 0], observed_mask[-1][:, 0]
        else:
            prim_a, prim_valid_a = enc_positions[-2][:, 0], enc_masks[-2][:, 0]
        pos_a = observed[-1].at[:, 0].set(prim_a)
        valid_a = observed_mask[-1].at[:, 0].set(prim_valid_a)
        pos_b, valid_b = enc_positions[-1], enc_masks[-1]

        dec = step_fn("decoder")
        dec_normals, dec_masks, dec_positions = [], [], []
        for _ in range(n_predict - 1):
            carry, normal, mask, position = dec(
                params, carry, pos_a, pos_b, valid_a, valid_b, goals, slot_mask
            )
            dec_normals.append(normal)
            dec_masks.append(mask)
            dec_positions.append(position)
            pos_a, valid_a = pos_b, valid_b
            pos_b, valid_b = position, mask

        rel_pred = jnp.stack(enc_normals + dec_normals)
        pred = jnp.stack(enc_positions + dec_positions)
        valid = jnp.stack(enc_masks + dec_masks)
        return rel_pred, pred, valid

    def forward_segmented(
        self,
        params: Dict,
        observed: jnp.ndarray,
        observed_mask: jnp.ndarray,
        goals: jnp.ndarray,
        slot_mask: jnp.ndarray,
        n_predict: int = 12,
        segment: int = 4,
        jit_cache: Optional[Dict] = None,
    ):
        """forward(n_predict=...) in jitted multi-step segments.

        Middle ground between the whole-rollout scan (which the remote
        chipless AOT compiler cannot schedule into VMEM for two_layer grid
        embeddings) and forward_stepwise (20 host-driven dispatches at
        ~20-40 ms tunnel latency each): each compiled program scans
        ``segment`` steps, cutting dispatches ~segment-fold while staying
        ~segment/20 the size of the full rollout for the AOT scheduler.
        Numerically identical to forward (same self.step, same decoder
        seeding, same scan body as encode/decode).
        """
        dt = getattr(self, "compute_dtype", None) or jnp.zeros(0).dtype
        observed = jnp.asarray(observed, dt)
        goals = jnp.asarray(goals, dt)
        s, a = observed.shape[1], observed.shape[2]
        carry = self.init_carry(s, a)
        cache = jit_cache if jit_cache is not None else {}

        def enc_fn(k):
            if ("enc", k) not in cache:
                def run(params, carry, obs, mask, goals, slot_mask):
                    def body(c, inp):
                        o1, o2, m1, m2 = inp
                        c, normal, msk = self.step(
                            params, "encoder", c, o1, o2, m1, m2, goals, slot_mask
                        )
                        pos = (o2 + normal[..., :2]) * msk[..., None]
                        return c, (normal, msk, pos)

                    c, outs = jax.lax.scan(
                        body, carry, (obs[:-1], obs[1:], mask[:-1], mask[1:])
                    )
                    return c, outs
                cache[("enc", k)] = jax.jit(run)
            return cache[("enc", k)]

        def dec_fn(k):
            if ("dec", k) not in cache:
                def run(params, carry, pos_a, valid_a, pos_b, valid_b, goals,
                        slot_mask):
                    def body(state, _):
                        c, pa, va, pb, vb = state
                        c, normal, msk = self.step(
                            params, "decoder", c, pa, pb, va, vb, goals, slot_mask
                        )
                        new_pos = (pb + normal[..., :2]) * msk[..., None]
                        return (c, pb, vb, new_pos, msk), (normal, msk, new_pos)

                    state, outs = jax.lax.scan(
                        body, (carry, pos_a, valid_a, pos_b, valid_b), None,
                        length=k,
                    )
                    return state, outs
                cache[("dec", k)] = jax.jit(run)
            return cache[("dec", k)]

        enc_normals, enc_masks, enc_positions = [], [], []
        t = 0
        n_trans = observed.shape[0] - 1
        while t < n_trans:
            k = min(segment, n_trans - t)
            carry, (normals, masks, positions) = enc_fn(k)(
                params, carry, observed[t : t + k + 1],
                observed_mask[t : t + k + 1], goals, slot_mask,
            )
            enc_normals.append(normals)
            enc_masks.append(masks)
            enc_positions.append(positions)
            t += k
        enc_normals = jnp.concatenate(enc_normals)
        enc_masks = jnp.concatenate(enc_masks)
        enc_positions = jnp.concatenate(enc_positions)

        # decoder seeding identical to forward()
        if observed.shape[0] == 2:
            prim_a, prim_valid_a = observed[-1][:, 0], observed_mask[-1][:, 0]
        else:
            prim_a, prim_valid_a = enc_positions[-2][:, 0], enc_masks[-2][:, 0]
        pos_a = observed[-1].at[:, 0].set(prim_a)
        valid_a = observed_mask[-1].at[:, 0].set(prim_valid_a)
        pos_b, valid_b = enc_positions[-1], enc_masks[-1]

        dec_normals, dec_masks, dec_positions = [], [], []
        t = 0
        n_steps = n_predict - 1
        while t < n_steps:
            k = min(segment, n_steps - t)
            state, (normals, masks, positions) = dec_fn(k)(
                params, carry, pos_a, valid_a, pos_b, valid_b, goals, slot_mask
            )
            carry, pos_a, valid_a, pos_b, valid_b = state
            dec_normals.append(normals)
            dec_masks.append(masks)
            dec_positions.append(positions)
            t += k

        rel_pred = jnp.concatenate([enc_normals] + dec_normals)
        pred = jnp.concatenate([enc_positions] + dec_positions)
        valid = jnp.concatenate([enc_masks] + dec_masks)
        return rel_pred, pred, valid


class LSTMPredictor:
    """Path-level prediction API mirroring LSTMPredictor.__call__
    (/root/reference/trajnetbaselines/lstm/lstm.py:285-313): paths in,
    ``{mode: [primary [12,2], neighbours [12,Nn,2]]}`` out.
    """

    def __init__(self, model: LSTM, params: Dict):
        self.model = model
        self.params = params
        self._jit_cache = {}

    def _rollout(self, s, a, n_predict):
        key = (s, a, n_predict)
        if key not in self._jit_cache:
            def fn(params, observed, observed_mask, goals, slot_mask):
                return self.model.forward(
                    params, observed, observed_mask, goals, slot_mask,
                    n_predict=n_predict,
                )
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def save(self, state, filename: str) -> None:
        from ..utils.checkpoint import save_predictor

        save_predictor(self, state, filename)

    @staticmethod
    def load(filename: str) -> "LSTMPredictor":
        from ..utils.checkpoint import load_predictor

        return load_predictor(filename)

    def __call__(
        self,
        paths,
        scene_goal,
        n_predict: int = 12,
        modes: int = 1,
        predict_all: bool = True,
        obs_length: int = 9,
        start_length: int = 0,
        args=None,
    ):
        from ..data import Reader, augmentation, batching

        xy = Reader.paths_to_xy(paths)
        scene_goal = np.asarray(scene_goal, dtype=np.float32)

        normalize = bool(getattr(args, "normalize_scene", False)) if args is not None else False
        if normalize:
            xy, rotation, center, scene_goal = augmentation.center_scene(
                xy, obs_length, goals=scene_goal
            )

        packed = batching.pack_scenes([xy[start_length:obs_length]])
        goals = np.zeros((1, packed.max_agents, 2), dtype=np.float32)
        goals[0, : scene_goal.shape[0]] = scene_goal[: packed.max_agents]

        slot_mask = (np.arange(packed.max_agents)[None, :] < packed.num_agents[:, None])

        fn = self._rollout(packed.num_scenes, packed.max_agents, n_predict)
        multimodal_outputs = {}
        for num_p in range(modes):
            _, pred, valid = fn(
                self.params, packed.xy, packed.mask, jnp.asarray(goals), jnp.asarray(slot_mask)
            )
            pred = np.asarray(pred)
            valid = np.asarray(valid)
            n_agents = xy.shape[1]
            output = batching.mask_to_nan(pred, valid)[:, 0, :n_agents]  # [T', A, 2]
            if normalize:
                output = augmentation.inverse_scene(output, rotation, center)
            multimodal_outputs[num_p] = [
                output[-n_predict:, 0],
                output[-n_predict:, 1:],
            ]
        return multimodal_outputs
