"""VAE trajectory forecaster (DESIRE-style conditional VAE).

Behavioural mirror of /root/reference/trajnetbaselines/vae/vae.py:26-398 on the
dense scene-axis engine:

- observation encoder + (training-only) prediction encoder share the masked
  step; the VAE encoder maps [h_obs ++ h_pred] to (z_mu, relu-floored log
  variance) (vae.py:317-332, note the reference's 0.01 + relu(log var));
- the latent sample gates the decoder hidden state multiplicatively
  (h <- h * relu(W z), vae.py:88-107);
- with desire=True (the reference default, vae.py:77) test-time sampling uses
  mu=0 and LOG-variance=1 — i.e. variance e, an upstream quirk kept for
  parity;
- k modes decode from k fresh latent samples; encoder normals are shared
  across modes.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.core import init_linear, linear
from .lstm import LSTM


class VAE(LSTM):
    def __init__(self, embedding_dim=64, hidden_dim=128, pool=None, pool_to_input=True,
                 goal_dim=None, goal_flag=False, num_modes=1, latent_dim=128,
                 desire=True):
        super().__init__(embedding_dim, hidden_dim, pool, pool_to_input, goal_dim, goal_flag)
        self.num_modes = num_modes
        self.latent_dim = latent_dim
        self.desire = desire

    def init_params(self, key) -> Dict:
        keys = jax.random.split(key, 8)
        params = super().init_params(keys[0])
        from ..ops.core import init_lstm_cell

        # encoder := obs encoder; decoder := shared decoder; plus pred encoder
        params["pred_encoder"] = init_lstm_cell(keys[1], self.input_dim, self.hidden_dim)
        params["vae_encoder_xy"] = {
            "fc_mu": init_linear(keys[2], 2 * self.hidden_dim, self.latent_dim),
            "fc_var": init_linear(keys[3], 2 * self.hidden_dim, self.latent_dim),
        }
        params["vae_encoder_x"] = {
            "fc_mu": init_linear(keys[4], self.hidden_dim, self.latent_dim),
            "fc_var": init_linear(keys[5], self.hidden_dim, self.latent_dim),
        }
        params["vae_decoder"] = init_linear(keys[6], self.latent_dim, self.hidden_dim)
        return params

    @staticmethod
    def vae_encode(enc_params, inputs):
        """(z_mu, z_log_var) with the reference's ReLU floors."""
        z_mu = jax.nn.relu(linear(enc_params["fc_mu"], inputs))
        z_log_var = 0.01 + jax.nn.relu(linear(enc_params["fc_var"], inputs))
        return z_mu, z_log_var

    def sample_latent(self, key, z_mu, z_log_var, training: bool):
        if training:
            eps = jax.random.normal(key, z_mu.shape, z_mu.dtype)
            return z_mu + jnp.exp(0.5 * z_log_var) * eps
        # test time, desire=True: mu=0, log var=1 -> std = e^0.5 (vae.py:280-284)
        return jax.random.normal(key, z_mu.shape, z_mu.dtype) * jnp.exp(0.5 * z_log_var)

    def forward(self, params, observed, observed_mask, goals, slot_mask,
                prediction_truth=None, prediction_truth_mask=None, n_predict=None,
                key=None, training=None, num_modes=None):
        """Returns (rel_pred_list, pred_list, valid_list, z_distr_xy, z_distr_x)."""
        assert (prediction_truth is None) != (n_predict is None)
        # promote inputs to the compute dtype (or the ambient default
        # float) so scan carries stay dtype-consistent when params and
        # data dtypes differ (e.g. f64 params under x64 tests)
        dt = getattr(self, "compute_dtype", None) or jnp.zeros(0).dtype  # getattr: older pickles lack the attr
        observed = jnp.asarray(observed, dt)
        goals = jnp.asarray(goals, dt)
        if prediction_truth is not None:
            prediction_truth = jnp.asarray(prediction_truth, dt)
        if training is None:
            training = prediction_truth is not None
        if key is None:
            key = jax.random.PRNGKey(0)
        num_modes = num_modes if num_modes is not None else self.num_modes
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

        if prediction_truth is not None:
            chain = jnp.concatenate([observed[-1:], prediction_truth], axis=0)
            chain_mask = jnp.concatenate([observed_mask[-1:], prediction_truth_mask], axis=0)
            n_steps = chain.shape[0] - 1
        else:
            chain, chain_mask = None, None
            n_steps = n_predict - 1

        # ---- latent distributions
        z_distr_xy = None
        z_mu = z_var_log = None
        if training:
            pred_carry = self.init_carry(s, a)

            def body(c, inputs):
                obs1, obs2, p1, p2 = inputs
                c, _, _ = self.step(
                    {**params, "encoder": params["pred_encoder"]}, "encoder",
                    c, obs1, obs2, p1, p2, goals, slot_mask,
                )
                return c, None

            pred_carry, _ = jax.lax.scan(
                body, pred_carry,
                (chain[:-1], chain[1:], chain_mask[:-1], chain_mask[1:]),
            )
            h_full = jnp.concatenate([carry.h, pred_carry.h], axis=-1)  # [S, A, 2H]
            z_mu, z_var_log = self.vae_encode(params["vae_encoder_xy"], h_full)
            z_distr_xy = jnp.concatenate([z_mu, z_var_log], axis=-1)

        z_distr_x = None
        z_mu_obs = jnp.zeros((s, a, self.latent_dim), carry.h.dtype)
        z_var_log_obs = jnp.ones((s, a, self.latent_dim), carry.h.dtype)
        if not self.desire:
            z_mu_obs, z_var_log_obs = self.vae_encode(params["vae_encoder_x"], carry.h)
            z_distr_x = jnp.concatenate([z_mu_obs, z_var_log_obs], axis=-1)

        # ---- k decoded modes
        rel_list, pred_list, valid_list = [], [], []
        for _ in range(num_modes):
            key, sub = jax.random.split(key)
            if training:
                z = self.sample_latent(sub, z_mu, z_var_log, True)
            else:
                z = self.sample_latent(sub, z_mu_obs, z_var_log_obs, False)
            gate = jax.nn.relu(linear(params["vae_decoder"], z))  # [S, A, H]
            carry_dec = carry._replace(h=carry.h * gate)

            _, dec_normals, dec_masks, dec_positions, _ = self.decode(
                params, carry_dec, pos_a, valid_a, pos_b, valid_b, goals, slot_mask,
                chain, chain_mask, n_steps,
            )
            rel_list.append(jnp.concatenate([enc_normals, dec_normals], axis=0))
            pred_list.append(jnp.concatenate([enc_positions, dec_positions], axis=0))
            valid_list.append(jnp.concatenate([enc_masks, dec_masks], axis=0))

        return rel_list, pred_list, valid_list, z_distr_xy, z_distr_x


class VAEPredictor:
    """Path-level prediction API mirroring VAEPredictor.__call__
    (/root/reference/trajnetbaselines/vae/vae.py:366-398)."""

    def __init__(self, model: VAE, params: Dict):
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

        _, pred_list, valid_list, _, _ = self.model.forward(
            self.params,
            jnp.asarray(packed.xy), jnp.asarray(packed.mask),
            jnp.asarray(goals), jnp.asarray(slot_mask),
            n_predict=n_predict, key=jax.random.PRNGKey(seed),
            training=False, num_modes=modes,
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
