"""Social GAN: k-sample LSTM generator + LSTM discriminator.

Behavioural mirror of /root/reference/trajnetbaselines/sgan/sgan.py:46-631 on
the dense scene-axis engine:

- LSTMGenerator is the LSTM forecaster with a noise bottleneck between
  encoder and decoder: h -> [mlp(h) ++ z] with one noise vector z shared by
  every track of the batch (sgan.py:200-221).
- LSTMDiscriminator encodes obs ++ prediction with the same masked step and
  scores each scene's primary hidden state through an MLP (which ends in a
  ReLU, as the reference's make_mlp appends an activation after every layer).
- SGAN.forward runs k generator rollouts (one per variety sample) and scores
  real/fake sequences when a discriminator is in play.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.core import init_lstm_cell, init_mlp, linear, lstm_cell, mlp
from .lstm import LSTM


def get_noise(key, shape, noise_type: str, dtype=None):
    dtype = dtype or jnp.zeros(0).dtype
    if noise_type == "gaussian":
        return jax.random.normal(key, shape, dtype)
    if noise_type == "uniform":
        return jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
    raise ValueError(f'Unrecognized noise type "{noise_type}"')


class LSTMGenerator(LSTM):
    def __init__(self, embedding_dim=64, hidden_dim=128, pool=None, pool_to_input=True,
                 goal_dim=None, goal_flag=False, noise_dim=8, no_noise=False,
                 noise_type="gaussian"):
        super().__init__(embedding_dim, hidden_dim, pool, pool_to_input, goal_dim, goal_flag)
        self.noise_dim = noise_dim
        self.no_noise = no_noise
        self.noise_type = noise_type

    def init_params(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        params = super().init_params(k1)
        params["mlp_decoder_context"] = init_mlp(
            k2, [self.hidden_dim, self.hidden_dim - self.noise_dim]
        )
        return params

    def adding_noise(self, params, h, key):
        """Replace the trailing noise_dim hidden units with shared noise."""
        if self.no_noise:
            return h
        new_h = mlp(params["mlp_decoder_context"], h)  # [S, A, H - noise]
        z = get_noise(key, (self.noise_dim,), self.noise_type, h.dtype)
        z = jnp.broadcast_to(z, h.shape[:-1] + (self.noise_dim,))
        return jnp.concatenate([new_h, z], axis=-1)

    def forward(self, params, observed, observed_mask, goals, slot_mask,
                prediction_truth=None, prediction_truth_mask=None,
                n_predict=None, key=None):
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

        if observed.shape[0] == 2:
            prim_a, prim_valid_a = observed[-1][:, 0], observed_mask[-1][:, 0]
        else:
            prim_a, prim_valid_a = enc_positions[-2][:, 0], enc_pos_valid[-2][:, 0]
        pos_a = observed[-1].at[:, 0].set(prim_a)
        valid_a = observed_mask[-1].at[:, 0].set(prim_valid_a)
        pos_b, valid_b = enc_positions[-1], enc_pos_valid[-1]

        # GAN-specific: noise bottleneck on the encoder hidden state
        if key is None:
            key = jax.random.PRNGKey(0)
        carry = carry._replace(h=self.adding_noise(params, carry.h, key))

        if prediction_truth is not None:
            chain = jnp.concatenate([observed[-1:], prediction_truth], axis=0)
            chain_mask = jnp.concatenate([observed_mask[-1:], prediction_truth_mask], axis=0)
            n_steps = chain.shape[0] - 1
        else:
            chain, chain_mask = None, None
            n_steps = n_predict - 1

        carry, dec_normals, dec_masks, dec_positions, _ = self.decode(
            params, carry, pos_a, valid_a, pos_b, valid_b, goals, slot_mask,
            chain, chain_mask, n_steps,
        )

        rel_pred = jnp.concatenate([enc_normals, dec_normals], axis=0)
        pred = jnp.concatenate([enc_positions, dec_positions], axis=0)
        valid = jnp.concatenate([enc_masks, dec_masks], axis=0)
        return rel_pred, pred, valid


class LSTMDiscriminator(LSTM):
    """Encoder-only LSTM scoring primary tracks of (observed ++ prediction)."""

    def __init__(self, embedding_dim=64, hidden_dim=128, pool=None, pool_to_input=True,
                 goal_dim=None, goal_flag=False):
        super().__init__(embedding_dim, hidden_dim, pool, pool_to_input, goal_dim, goal_flag)

    def init_params(self, key) -> Dict:
        keys = jax.random.split(key, 6)
        from ..ops.embeddings import init_hidden2normal, init_input_embedding

        params = {
            "input_embedding": init_input_embedding(keys[0], 2, self.embedding_dim),
            "goal_embedding": init_input_embedding(keys[1], 2, self.goal_dim),
            "encoder": init_lstm_cell(keys[2], self.input_dim, self.hidden_dim),
            # hidden2normal unused by scoring but keeps the step engine uniform
            "hidden2normal": init_hidden2normal(keys[3], self.hidden_dim),
            "real_classifier": init_mlp(
                keys[4], [self.hidden_dim, self.hidden_dim // 2, self.hidden_dim // 4, 1]
            ),
        }
        if self.pool is not None:
            params["pool"] = self.pool.init_params(keys[5])
        return params

    def score(self, params, observed, observed_mask, prediction, prediction_mask,
              goals, slot_mask):
        """Returns [S] scores of the primary track per scene."""
        # promote like forward() does: the scan carry must match the cell's
        # compute dtype even when raw f32 observations meet bf16 predictions
        dt = getattr(self, "compute_dtype", None) or jnp.zeros(0).dtype
        xy = jnp.concatenate(
            [jnp.asarray(observed, dt), jnp.asarray(prediction, dt)], axis=0
        )
        mask = jnp.concatenate([observed_mask, prediction_mask], axis=0)
        goals = jnp.asarray(goals, dt)
        s, a = xy.shape[1], xy.shape[2]
        carry = self.init_carry(s, a)
        carry, _, _, _, _ = self.encode(params, carry, xy, mask, goals, slot_mask)
        primary_hidden = carry.h[:, 0]  # [S, H]
        # make_mlp appends ReLU after every Linear, including the last
        return mlp(params["real_classifier"], primary_hidden)[:, 0]


class SGAN:
    """k-sample generator + discriminator pair."""

    def __init__(self, generator: Optional[LSTMGenerator] = None,
                 discriminator: Optional[LSTMDiscriminator] = None,
                 k: int = 1, d_steps: int = 1, g_steps: int = 1):
        self.generator = generator if generator is not None else LSTMGenerator()
        self.discriminator = discriminator if discriminator is not None else LSTMDiscriminator()
        self.k = k
        self.d_steps = d_steps
        self.g_steps = g_steps

    def with_dtype(self, dtype):
        self.generator.with_dtype(dtype)
        self.discriminator.with_dtype(dtype)
        return self

    def init_params(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        return {
            "generator": self.generator.init_params(k1),
            "discriminator": self.discriminator.init_params(k2),
        }

    def forward(self, params, observed, observed_mask, goals, slot_mask,
                prediction_truth=None, prediction_truth_mask=None, n_predict=None,
                step_type="g", pred_length=12, key=None, k=None):
        """k rollouts (+ discriminator scores when truth is available).

        prediction_truth(+mask) carries the FULL [pred_length, S, A, ...]
        future.  The generator chain drops the last frame (the reference
        trims via ``prediction_truth[:-1]`` before chaining, sgan.py:368-370,
        so the decoder runs pred_length - 1 steps and the encoder contributes
        the first predicted frame); the discriminator scores the full truth.

        Returns (rel_pred_list, pred_list, valid_list, scores_real, scores_fake).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        k = k if k is not None else self.k
        n_rollouts = 1 if step_type == "d" else k

        gen_truth = prediction_truth[:-1] if prediction_truth is not None else None
        gen_truth_mask = (
            prediction_truth_mask[:-1] if prediction_truth_mask is not None else None
        )

        rel_list, pred_list, valid_list = [], [], []
        for i in range(n_rollouts):
            key, sub = jax.random.split(key)
            rel, pred, valid = self.generator.forward(
                params["generator"], observed, observed_mask, goals, slot_mask,
                gen_truth, gen_truth_mask, n_predict, key=sub,
            )
            rel_list.append(rel)
            pred_list.append(pred)
            valid_list.append(valid)

        scores_real, scores_fake = None, None
        if self.d_steps and prediction_truth is not None:
            scores_real = self.discriminator.score(
                params["discriminator"], observed, observed_mask,
                prediction_truth, prediction_truth_mask, goals, slot_mask,
            )
            fake = pred_list[-1][-pred_length:]
            fake_valid = valid_list[-1][-pred_length:]
            scores_fake = self.discriminator.score(
                params["discriminator"], observed, observed_mask,
                fake, fake_valid, goals, slot_mask,
            )
        return rel_list, pred_list, valid_list, scores_real, scores_fake


class SGANPredictor:
    """Path-level prediction API mirroring SGANPredictor.__call__
    (/root/reference/trajnetbaselines/sgan/sgan.py:596-630)."""

    def __init__(self, model: SGAN, params: Dict):
        self.model = model
        self.params = params

    def save(self, state, filename: str) -> None:
        from ..utils.checkpoint import save_predictor

        save_predictor(self, state, filename)

    @staticmethod
    def load(filename: str):
        from ..utils.checkpoint import load_predictor

        return load_predictor(filename)

    def __call__(self, paths, scene_goal, n_predict=12, modes=1, predict_all=True,
                 obs_length=9, start_length=0, args=None, seed=0):
        from ..data import Reader, augmentation, batching

        xy = Reader.paths_to_xy(paths)
        scene_goal = np.asarray(scene_goal, dtype=np.float64)
        normalize = bool(getattr(args, "normalize_scene", False)) if args is not None else False
        if normalize:
            xy, rotation, center, scene_goal = augmentation.center_scene(
                xy, obs_length, goals=scene_goal
            )

        packed = batching.pack_scenes([xy[start_length:obs_length]])
        goals = np.zeros((1, packed.max_agents, 2), dtype=np.float64)
        goals[0, : scene_goal.shape[0]] = scene_goal[: packed.max_agents]
        slot_mask = np.arange(packed.max_agents)[None, :] < packed.num_agents[:, None]

        key = jax.random.PRNGKey(seed)
        _, pred_list, valid_list, _, _ = self.model.forward(
            self.params,
            jnp.asarray(packed.xy), jnp.asarray(packed.mask),
            jnp.asarray(goals), jnp.asarray(slot_mask),
            n_predict=n_predict, key=key, k=modes,
        )

        multimodal_outputs = {}
        n_agents = xy.shape[1]
        for num_p, (pred, valid) in enumerate(zip(pred_list, valid_list)):
            out = batching.mask_to_nan(np.asarray(pred), np.asarray(valid))[:, 0, :n_agents]
            if normalize:
                out = augmentation.inverse_scene(out, rotation, center)
            if num_p == 0:
                multimodal_outputs[num_p] = [out[-n_predict:, 0], out[-n_predict:, 1:]]
            else:
                multimodal_outputs[num_p] = [out[-n_predict:, 0], []]
        return multimodal_outputs
