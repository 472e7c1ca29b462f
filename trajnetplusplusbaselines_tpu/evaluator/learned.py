"""Batched dataset prediction for learned models.

The reference predicts test scenes one-by-one across 12 joblib processes
(/root/reference/trajnetbaselines/lstm/trajnet_evaluator.py:61).  Here scenes
are grouped by agent bucket and rolled out in large device batches — one
jit-compiled executable per bucket, thousands of scenes per call.
"""

from collections import defaultdict
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Reader, augmentation, batching

# compiled programs shared across predictors of IDENTICAL architecture in one
# process: evaluating 5 seeds of one config pays each (bucket, cell) compile
# once instead of five times.  (The remote axon backend compiles server-side
# and bypasses jax's persistent cache, so cross-process reuse is impossible —
# in-process sharing is the lever that matters.)  Keyed by the model's config
# fingerprint + the parameter tree shapes, so differing architectures can
# never alias.
_SHARED_PROGRAMS = {}


def _config_fingerprint(obj, _depth=0):
    """Deterministic fingerprint of primitive config attrs, recursing into
    nested model components (pool, generator, ...)."""
    if _depth > 3 or obj is None:
        return repr(obj)
    prims, nested = [], []
    for k in sorted(vars(obj)) if hasattr(obj, "__dict__") else []:
        v = vars(obj)[k]
        if isinstance(v, (int, float, str, bool, tuple)) or v is None:
            prims.append((k, v))
        elif isinstance(v, list) and all(
            isinstance(x, (int, float, str, bool)) for x in v
        ):
            prims.append((k, tuple(v)))
        elif hasattr(v, "__dict__") and not isinstance(v, jnp.ndarray):
            nested.append((k, _config_fingerprint(v, _depth + 1)))
    return f"{type(obj).__name__}({prims}, {nested})"


def _params_shape_key(params):
    return jax.tree.map(lambda x: (getattr(x, "shape", None),
                                   str(getattr(x, "dtype", None))), params)


class BatchedPredictor:
    """Wraps a model predictor for whole-dataset batched rollout.

    The predictor must expose .model (with .forward) and .params.
    Multimodal models take a key per mode; mode 0 keeps neighbours, further
    modes keep the primary only (matching SGANPredictor/VAEPredictor).
    """

    def __init__(self, predictor, modes: int = 1, batch_scenes: int = 64, seed: int = 0):
        self.predictor = predictor
        self.modes = modes
        self.batch_scenes = batch_scenes
        self.seed = seed
        # per-predictor goal requirement (the reference resolves goal_flag per
        # model, lstm/trajnet_evaluator.py:52): only goal-conditioned models
        # make the driver load test goal files
        self.goal_flag = bool(
            getattr(getattr(predictor, "model", None), "goal_flag", False)
        )
        self._arch_key = None
        self._jit_cache = {}
        self._device_params = None

    def _program_cache(self):
        """The process-wide program dict for this predictor's architecture."""
        if self._arch_key is None:
            model = self.predictor.model
            self._arch_key = (
                _config_fingerprint(model),
                str(_params_shape_key(self.predictor.params)),
                self.modes,
            )
        return _SHARED_PROGRAMS.setdefault(self._arch_key, {})

    def _rollout(self, num_scenes, num_agents, n_predict):
        """jit fn(params, xy, mask, goals, slot, key) -> (preds [K,T',S,A,2], valid)."""
        cache_key = (num_scenes, num_agents, n_predict)
        self._jit_cache = self._program_cache()
        if cache_key not in self._jit_cache:
            from ..models.sgan import SGAN
            from ..models.vae import VAE

            model, params = self.predictor.model, self.predictor.params
            modes = self.modes

            # params flow through as ARGUMENTS, never closure constants: a
            # closed-over weight pytree is baked into the HLO, so the
            # persistent compile cache could never hit across seeds of the
            # same architecture (every seed's eval recompiled every bucket)
            if isinstance(model, SGAN):
                # vmap the generator over mode keys: one compiled program for
                # any k (the 50-mode NLL evaluation would otherwise unroll 50
                # scans into the graph)
                def fn(params, xy, mask, goals, slot_mask, key):
                    keys = jax.random.split(key, modes)

                    def one(k):
                        _, pred, valid = model.generator.forward(
                            params["generator"], xy, mask, goals, slot_mask,
                            n_predict=n_predict, key=k,
                        )
                        return pred, valid

                    return jax.vmap(one)(keys)
            elif isinstance(model, VAE):
                def fn(params, xy, mask, goals, slot_mask, key):
                    _, pred_list, valid_list, _, _ = model.forward(
                        params, xy, mask, goals, slot_mask,
                        n_predict=n_predict, key=key, training=False, num_modes=modes,
                    )
                    return jnp.stack(pred_list), jnp.stack(valid_list)
            elif getattr(model.pool, "embedding_arch", None) in (
                "two_layer", "three_layer"
            ):
                # deep grid embeddings: the remote AOT compiler cannot
                # schedule the FULL scanned rollout into VMEM (S-LSTM eval
                # compiled 30+ min then OOMed); drive jitted 4-step scan
                # segments instead — numerically identical to forward
                # (tests/test_stepwise.py) at ~5x fewer tunnel dispatches
                # than the round-2 single-step fallback
                step_cache = self._jit_cache.setdefault("segmented", {})

                def fn(params, xy, mask, goals, slot_mask, key):
                    _, pred, valid = model.forward_segmented(
                        params, xy, mask, goals, slot_mask,
                        n_predict=n_predict, segment=4, jit_cache=step_cache,
                    )
                    return pred[None], valid[None]

                self._jit_cache[cache_key] = fn  # not jit: segments jit inside
                return self._jit_cache[cache_key]
            else:
                # deterministic LSTM: all modes identical (as in the reference)
                def fn(params, xy, mask, goals, slot_mask, key):
                    _, pred, valid = model.forward(
                        params, xy, mask, goals, slot_mask, n_predict=n_predict
                    )
                    return pred[None], valid[None]

            self._jit_cache[cache_key] = jax.jit(fn)
        return self._jit_cache[cache_key]

    def predict_dataset(self, processed_scenes: List[list], scene_goals, args):
        """processed_scenes: per-scene path lists already preprocess_test-ed.

        Returns a list of {mode: [primary [n,2], neighbours [n,Nn,2]]}.
        """
        n_predict = args.pred_length
        obs_length = args.obs_length
        normalize = getattr(args, "normalize_scene", False)

        prepared = []
        for paths, goal in zip(processed_scenes, scene_goals):
            xy = Reader.paths_to_xy(paths)
            goal = np.asarray(goal, dtype=np.float64)
            rotation = center = None
            if normalize:
                xy, rotation, center, goal = augmentation.center_scene(
                    xy, obs_length, goals=goal
                )
            prepared.append((xy[:obs_length], goal, rotation, center, xy.shape[1]))

        # group by agent bucket; scenes larger than the largest default
        # bucket get a dynamic bucket of their real agent count so every
        # neighbour is predicted (Col-I needs all neighbour rollouts)
        by_bucket = defaultdict(list)
        for i, (xy, *_rest) in enumerate(prepared):
            n = xy.shape[1]
            by_bucket[max(batching.agent_bucket(n), n)].append(i)

        results = [None] * len(prepared)
        for bucket, indices in sorted(by_bucket.items()):
            # scale the device batch inversely with the agent bucket so the
            # per-batch tensor volume stays roughly constant: at A=128 a
            # 64-scene social-pooling batch cannot even be scheduled into
            # VMEM (the remote compiler OOMs); 4 scenes compiles and runs in
            # seconds, and big-agent scenes are rare anyway
            bucket_batch = max(1, (self.batch_scenes * 8) // max(bucket, 8))
            for start in range(0, len(indices), bucket_batch):
                chunk = indices[start : start + bucket_batch]
                xs = [prepared[i][0] for i in chunk]
                gs = []
                for i in chunk:
                    g = np.zeros((bucket, 2), dtype=np.float64)
                    real = prepared[i][1][:bucket]
                    g[: len(real)] = real
                    gs.append(g)
                packed = batching.pack_scenes(
                    xs, gs, bucket=bucket, pad_scenes_to=bucket_batch
                )
                slot = np.arange(bucket)[None] < packed.num_agents[:, None]
                fn = self._rollout(bucket_batch, bucket, n_predict)

                if self._device_params is None:
                    # pickles hold numpy leaves; passing those to a jitted fn
                    # re-uploads every weight on EVERY call (17 MB/step for
                    # S-LSTM through a ~5 MB/s tunnel) — pin them on device
                    self._device_params = jax.device_put(self.predictor.params)
                self.seed += 1
                preds, valids = fn(
                    self._device_params,
                    jnp.asarray(packed.xy),
                    jnp.asarray(packed.mask),
                    jnp.asarray(packed.goals),
                    jnp.asarray(slot),
                    jax.random.PRNGKey(self.seed),
                )
                preds = np.asarray(preds)
                valids = np.asarray(valids)
                n_modes_out = preds.shape[0]

                for mode in range(self.modes):
                    out = batching.mask_to_nan(
                        preds[min(mode, n_modes_out - 1)],
                        valids[min(mode, n_modes_out - 1)],
                    )  # [T', S, A, 2]

                    for s, i in enumerate(chunk):
                        _, _, rotation, center, n_agents = prepared[i]
                        scene_out = out[-n_predict:, s, :n_agents]
                        if normalize:
                            scene_out = augmentation.inverse_scene(
                                scene_out, rotation, center
                            )
                        if results[i] is None:
                            results[i] = {}
                        if mode == 0:
                            results[i][mode] = [scene_out[:, 0], scene_out[:, 1:]]
                        else:
                            results[i][mode] = [scene_out[:, 0], []]
        return results
