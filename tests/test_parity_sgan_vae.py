"""Numerical parity of the SGAN and VAE engines vs the executed reference.

The reference (sgan/sgan.py, vae/vae.py) is run as a float64 oracle with
transplanted weights.  Randomness is pinned by monkeypatching the noise /
latent samplers on both sides with the same fixed draws, so forward values
and gradients must match to op-reordering tolerance — this upgrades the
"structural mirror" rows of PARITY.md to oracle parity and pins the SGAN
teacher-forcing chain (the generator decoder runs pred_length - 1 steps,
sgan/sgan.py:368-370).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os

if not os.path.isdir("/root/reference"):
    pytest.skip("reference checkout not mounted", allow_module_level=True)

import jax
import jax.numpy as jnp

import trajnetplusplusbaselines_tpu.models.sgan as sgan_mod
from trajnetplusplusbaselines_tpu.data.batching import nan_to_mask
from trajnetplusplusbaselines_tpu.losses import kld_loss, prediction_loss
from trajnetplusplusbaselines_tpu.models.sgan import SGAN, LSTMDiscriminator, LSTMGenerator
from trajnetplusplusbaselines_tpu.models.vae import VAE

from .reference_harness import (
    copy_sgan_weights,
    copy_vae_weights,
    load_reference,
    random_scene,
)

NOISE_DIM = 16
LATENT_DIM = 32
OBS, PRED, SEQ = 9, 12, 21


@pytest.fixture(autouse=True)
def _seed():
    torch.set_default_dtype(torch.float64)
    torch.manual_seed(0)
    yield
    torch.set_default_dtype(torch.float32)


def make_scenes(seed=0):
    rng = np.random.default_rng(seed)
    return [random_scene(rng, SEQ, 4), random_scene(rng, SEQ, 3, nan_pattern=False)]


def dense_batch(scenes):
    """Scenes -> ([T,S,A,2] values, masks, goals, slot) dense tensors."""
    a = max(s.shape[1] for s in scenes)
    xy = np.stack(
        [np.pad(s, ((0, 0), (0, a - s.shape[1]), (0, 0)), constant_values=np.nan)
         for s in scenes], axis=1,
    )
    vals, mask = nan_to_mask(xy)
    slot = np.zeros((len(scenes), a), bool)
    for i, s in enumerate(scenes):
        slot[i, : s.shape[1]] = True
    goals = np.zeros((len(scenes), a, 2))
    return vals, mask, goals, slot


def flat_batch(scenes):
    """Scenes -> reference-style flat concat + batch_split."""
    xy = np.concatenate(scenes, axis=1)
    batch_split = np.cumsum([0] + [s.shape[1] for s in scenes])
    return xy, batch_split


def compare_dense_vs_flat(flat, dense, batch_split, scenes, atol=1e-8):
    """flat [T', N, D] with NaNs vs dense [T', S, A, D] masked values."""
    for i in range(len(scenes)):
        lo, hi = batch_split[i], batch_split[i + 1]
        n = hi - lo
        ref_i = flat[:, lo:hi]
        ours_i = dense[:, i, :n]
        m = ~np.isnan(ref_i[..., 0])
        np.testing.assert_allclose(ours_i[m], ref_i[m], atol=atol, rtol=0)


# --------------------------------------------------------------------- SGAN


def make_sgan_pair(k=2):
    ref = load_reference()
    torch.manual_seed(0)
    ref_model = ref.sgan.sgan.SGAN(
        generator=ref.sgan.sgan.LSTMGenerator(noise_dim=NOISE_DIM),
        discriminator=ref.sgan.sgan.LSTMDiscriminator(),
        k=k,
    ).double()

    model = SGAN(
        generator=LSTMGenerator(noise_dim=NOISE_DIM),
        discriminator=LSTMDiscriminator(),
        k=k,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    params = copy_sgan_weights(ref_model, params)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
    return ref, ref_model, model, params


def pin_noise(monkeypatch, ref, k):
    """Pin the shared per-rollout noise vector z on both engines."""
    rng = np.random.default_rng(7)
    zs = rng.normal(size=(k, NOISE_DIM))
    ref_calls, our_calls = [0], [0]

    def ref_get_noise(shape, noise_type, device):
        z = torch.DoubleTensor(zs[ref_calls[0] % k])
        ref_calls[0] += 1
        return z

    def our_get_noise(key, shape, noise_type, dtype=None):
        z = jnp.asarray(zs[our_calls[0] % k])
        our_calls[0] += 1
        return z

    monkeypatch.setattr(ref.sgan.sgan, "get_noise", ref_get_noise)
    monkeypatch.setattr(sgan_mod, "get_noise", our_get_noise)


@pytest.mark.parametrize("mode", ["train", "test"])
def test_sgan_parity(mode, monkeypatch):
    """Generator (noise bottleneck pinned) + discriminator forward at 1e-8."""
    k = 2
    ref, ref_model, model, params = make_sgan_pair(k)
    pin_noise(monkeypatch, ref, k)

    scenes = make_scenes()
    xyf, bs = flat_batch(scenes)
    vals, mask, goals, slot = dense_batch(scenes)
    bs_t = torch.LongTensor(bs)
    xy_t = torch.DoubleTensor(xyf)
    goals_t = torch.zeros(xyf.shape[1], 2, dtype=torch.float64)

    with torch.no_grad():
        if mode == "train":
            ref_rel, ref_pred, ref_sr, ref_sf = ref_model(
                xy_t[:OBS], goals_t, bs_t, xy_t[OBS:SEQ].clone(),
                step_type="g", pred_length=PRED,
            )
        else:
            ref_rel, ref_pred, ref_sr, ref_sf = ref_model(
                xy_t[:OBS], goals_t, bs_t, n_predict=PRED, pred_length=PRED
            )

    kwargs = dict(step_type="g", pred_length=PRED, key=jax.random.PRNGKey(0))
    if mode == "train":
        kwargs.update(
            prediction_truth=jnp.asarray(vals[OBS:SEQ]),
            prediction_truth_mask=jnp.asarray(mask[OBS:SEQ]),
        )
    else:
        kwargs.update(n_predict=PRED)
    rel_list, pred_list, valid_list, sr, sf = model.forward(
        params, jnp.asarray(vals[:OBS]), jnp.asarray(mask[:OBS]),
        jnp.asarray(goals), jnp.asarray(slot), **kwargs
    )

    assert len(rel_list) == len(ref_rel) == k
    for ref_r, ref_p, r, p in zip(ref_rel, ref_pred, rel_list, pred_list):
        # teacher-forced decoder must run pred_length - 1 steps: total
        # (obs-1) + (pred-1) timesteps on both engines
        assert r.shape[0] == ref_r.shape[0] == (OBS - 1) + (PRED - 1)
        compare_dense_vs_flat(ref_r.numpy(), np.asarray(r), bs, scenes)
        compare_dense_vs_flat(ref_p.numpy(), np.asarray(p), bs, scenes)

    if mode == "train":
        np.testing.assert_allclose(np.asarray(sr), ref_sr.numpy()[:, 0], atol=1e-8, rtol=0)
        np.testing.assert_allclose(np.asarray(sf), ref_sf.numpy()[:, 0], atol=1e-8, rtol=0)
    else:
        assert sr is None and sf is None


def test_sgan_gradient_parity(monkeypatch):
    """Gradients through generator rollout + discriminator scores match the
    reference autograd: pins stop_gradient placement, the noise-bottleneck
    MLP backprop, and the fake-score path."""
    k = 1
    ref, ref_model, model, params = make_sgan_pair(k)
    pin_noise(monkeypatch, ref, k)

    scenes = make_scenes()
    xyf, bs = flat_batch(scenes)
    vals, mask, goals, slot = dense_batch(scenes)
    bs_t = torch.LongTensor(bs)
    xy_t = torch.DoubleTensor(xyf)
    goals_t = torch.zeros(xyf.shape[1], 2, dtype=torch.float64)

    crit = ref.lstm.loss.PredictionLoss()
    ref_rel, _, ref_sr, ref_sf = ref_model(
        xy_t[:OBS], goals_t, bs_t, xy_t[OBS:SEQ].clone(),
        step_type="g", pred_length=PRED,
    )
    targets_t = torch.DoubleTensor(xyf[OBS:SEQ] - xyf[OBS - 1 : SEQ - 1])
    loss_ref = crit(ref_rel[0][-PRED:], targets_t, bs_t) + ref_sf.sum() + ref_sr.sum()
    loss_ref.backward()
    g_gen_enc = ref_model.generator.encoder.weight_ih.grad.numpy().T
    g_gen_ctx = ref_model.generator.mlp_decoder_context[0].weight.grad.numpy().T
    g_d_enc = ref_model.discriminator.encoder.weight_ih.grad.numpy().T
    g_d_cls = ref_model.discriminator.real_classifier[0].weight.grad.numpy().T

    def loss_fn(p):
        rel_list, _, _, sr, sf = model.forward(
            p, jnp.asarray(vals[:OBS]), jnp.asarray(mask[:OBS]),
            jnp.asarray(goals), jnp.asarray(slot),
            prediction_truth=jnp.asarray(vals[OBS:SEQ]),
            prediction_truth_mask=jnp.asarray(mask[OBS:SEQ]),
            step_type="g", pred_length=PRED, key=jax.random.PRNGKey(0),
        )
        targets = jnp.asarray(vals[OBS:SEQ, :, 0] - vals[OBS - 1 : SEQ - 1, :, 0])
        return (
            prediction_loss(rel_list[0][-PRED:, :, 0], targets)
            + jnp.sum(sf) + jnp.sum(sr)
        )

    loss_j, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_ref.detach()), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(grads["generator"]["encoder"]["w_ih"]), g_gen_enc, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(grads["generator"]["mlp_decoder_context"][0]["w"]), g_gen_ctx, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(grads["discriminator"]["encoder"]["w_ih"]), g_d_enc, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(grads["discriminator"]["real_classifier"][0]["w"]), g_d_cls, atol=1e-12
    )


# ---------------------------------------------------------------------- VAE


def make_vae_pair(num_modes=2):
    ref = load_reference()
    torch.manual_seed(0)
    ref_model = ref.vae.vae.VAE(num_modes=num_modes, latent_dim=LATENT_DIM).double()

    model = VAE(num_modes=num_modes, latent_dim=LATENT_DIM)
    params = model.init_params(jax.random.PRNGKey(0))
    params = copy_vae_weights(ref_model, params)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
    return ref, ref_model, model, params


def pin_vae_latents(ref_model, model, scenes, num_modes, train):
    """Pin the per-mode latent draw on both engines with identical values.

    train=True pins the reparametrization epsilon (gradients still flow
    through z_mu / z_var_log); train=False pins the prior sample directly.
    """
    a = max(s.shape[1] for s in scenes)
    rng = np.random.default_rng(11)
    eps = rng.normal(size=(num_modes, len(scenes), a, LATENT_DIM))
    flat = np.concatenate(
        [eps[:, i, : s.shape[1]] for i, s in enumerate(scenes)], axis=1
    )  # [modes, N, latent]

    calls = [0]

    def ref_add_noise(hidden_cell_state, z_mu, z_var_log, z_mu_obs, z_var_log_obs):
        e = torch.DoubleTensor(flat[calls[0] % num_modes])
        calls[0] += 1
        if train:
            z_val = z_mu + torch.exp(0.5 * z_var_log) * e
        else:
            z_val = e
        decoder_output = ref_model.vae_decoder(z_val)
        hidden_state_new = [
            h * d for d, h in zip(decoder_output, hidden_cell_state[0])
        ]
        return (hidden_state_new, list(hidden_cell_state[1]))

    ref_model.add_noise = ref_add_noise

    our_calls = [0]

    def our_sample_latent(key, z_mu, z_var_log, training):
        e = jnp.asarray(eps[our_calls[0] % num_modes])
        our_calls[0] += 1
        if train:
            return z_mu + jnp.exp(0.5 * z_var_log) * e
        return e

    model.sample_latent = our_sample_latent


@pytest.mark.parametrize("mode", ["train", "test"])
def test_vae_parity(mode):
    """Per-mode decoder rollouts and the latent distribution at 1e-8."""
    num_modes = 2
    ref, ref_model, model, params = make_vae_pair(num_modes)

    scenes = make_scenes()
    pin_vae_latents(ref_model, model, scenes, num_modes, train=(mode == "train"))
    xyf, bs = flat_batch(scenes)
    vals, mask, goals, slot = dense_batch(scenes)
    bs_t = torch.LongTensor(bs)
    xy_t = torch.DoubleTensor(xyf)
    goals_t = torch.zeros(xyf.shape[1], 2, dtype=torch.float64)

    with torch.no_grad():
        if mode == "train":
            ref_model.train()
            # the reference VAE takes pred_length - 1 truth frames
            # (vae/vae.py:200, trainer passes batch_scene[obs:seq-1])
            ref_rel, ref_pred, ref_zxy, ref_zx = ref_model(
                xy_t[:OBS], goals_t, bs_t, xy_t[OBS : SEQ - 1].clone()
            )
        else:
            ref_model.eval()
            ref_rel, ref_pred, ref_zxy, ref_zx = ref_model(
                xy_t[:OBS], goals_t, bs_t, n_predict=PRED
            )

    kwargs = dict(key=jax.random.PRNGKey(0))
    if mode == "train":
        kwargs.update(
            prediction_truth=jnp.asarray(vals[OBS : SEQ - 1]),
            prediction_truth_mask=jnp.asarray(mask[OBS : SEQ - 1]),
            training=True,
        )
    else:
        kwargs.update(n_predict=PRED, training=False)
    rel_list, pred_list, valid_list, zxy, zx = model.forward(
        params, jnp.asarray(vals[:OBS]), jnp.asarray(mask[:OBS]),
        jnp.asarray(goals), jnp.asarray(slot), **kwargs
    )

    assert len(rel_list) == len(ref_rel) == num_modes
    for ref_r, ref_p, r, p in zip(ref_rel, ref_pred, rel_list, pred_list):
        assert r.shape[0] == ref_r.shape[0] == (OBS - 1) + (PRED - 1)
        compare_dense_vs_flat(ref_r.numpy(), np.asarray(r), bs, scenes)
        compare_dense_vs_flat(ref_p.numpy(), np.asarray(p), bs, scenes)

    if mode == "train":
        compare_dense_vs_flat(
            ref_zxy.numpy()[None], np.asarray(zxy)[None], bs, scenes
        )
    else:
        assert zxy is None
    assert zx is None and ref_zx is None  # desire=True default


def test_vae_gradient_parity():
    """Reconstruction + KLD gradients through the reparametrized latent match
    the reference autograd (epsilon pinned, gradient flows through both VAE
    encoders and the gating decoder)."""
    num_modes = 1
    ref, ref_model, model, params = make_vae_pair(num_modes)

    scenes = make_scenes()
    pin_vae_latents(ref_model, model, scenes, num_modes, train=True)
    xyf, bs = flat_batch(scenes)
    vals, mask, goals, slot = dense_batch(scenes)
    bs_t = torch.LongTensor(bs)
    xy_t = torch.DoubleTensor(xyf)
    goals_t = torch.zeros(xyf.shape[1], 2, dtype=torch.float64)

    ref_model.train()
    crit = ref.lstm.loss.PredictionLoss()
    kld = ref.vae.loss.KLDLoss()
    ref_rel, _, ref_zxy, _ = ref_model(
        xy_t[:OBS], goals_t, bs_t, xy_t[OBS : SEQ - 1].clone()
    )
    targets_t = torch.DoubleTensor(xyf[OBS:SEQ] - xyf[OBS - 1 : SEQ - 1])
    loss_ref = crit(ref_rel[0][-PRED:], targets_t, bs_t) + kld(ref_zxy, bs_t)
    loss_ref.backward()
    g_enc = ref_model.obs_encoder.weight_ih.grad.numpy().T
    g_dec = ref_model.decoder.weight_hh.grad.numpy().T
    g_pred_enc = ref_model.pred_encoder.weight_ih.grad.numpy().T
    g_mu = ref_model.vae_encoder_xy.fc_mu.weight.grad.numpy().T
    g_gate = ref_model.vae_decoder.fc.weight.grad.numpy().T

    def loss_fn(p):
        rel_list, _, _, zxy, _ = model.forward(
            p, jnp.asarray(vals[:OBS]), jnp.asarray(mask[:OBS]),
            jnp.asarray(goals), jnp.asarray(slot),
            prediction_truth=jnp.asarray(vals[OBS : SEQ - 1]),
            prediction_truth_mask=jnp.asarray(mask[OBS : SEQ - 1]),
            training=True, key=jax.random.PRNGKey(0),
        )
        targets = jnp.asarray(vals[OBS:SEQ, :, 0] - vals[OBS - 1 : SEQ - 1, :, 0])
        return (
            prediction_loss(rel_list[0][-PRED:, :, 0], targets)
            + kld_loss(zxy[:, 0])
        )

    loss_j, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_ref.detach()), atol=1e-10)
    np.testing.assert_allclose(np.asarray(grads["encoder"]["w_ih"]), g_enc, atol=1e-12)
    np.testing.assert_allclose(np.asarray(grads["decoder"]["w_hh"]), g_dec, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(grads["pred_encoder"]["w_ih"]), g_pred_enc, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(grads["vae_encoder_xy"]["fc_mu"]["w"]), g_mu, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(grads["vae_decoder"]["w"]), g_gate, atol=1e-12)
