"""Training losses on dense ``[time, scene, ...]`` batches.

Behavioural mirrors of /root/reference/trajnetbaselines/lstm/loss.py:6-208 and
/root/reference/trajnetbaselines/vae/loss.py:6-52, restated for the padded
scene-axis layout: the primary pedestrian is agent 0 of every scene, so the
reference's ``batch_split`` gather becomes a plain ``[:, :, 0]`` slice done by
the caller.  All losses take a ``scene_mask [S]`` so padded scenes contribute
nothing.

Key invariants kept bit-for-bit (SURVEY.md section 2.3):
- Gaussian mixture with flat background: -log(0.01 + 0.2 N(mu, 3) + 0.79 N(mu, sigma))
- L2 loss multiplier x100
- collision hinge on distances below col_distance with detached neighbours
- GAN label smoothing y_real ~ U(0.7, 1.2)
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp


def gaussian_2d(params5: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Density of a correlated 2D Gaussian. params5 [..., 5], xy [..., 2]."""
    mu1, mu2 = params5[..., 0], params5[..., 1]
    s1, s2, rho = params5[..., 2], params5[..., 3], params5[..., 4]
    norm1 = xy[..., 0] - mu1
    norm2 = xy[..., 1] - mu2
    s1s2 = s1 * s2
    z = (norm1 / s1) ** 2 + (norm2 / s2) ** 2 - 2 * rho * norm1 * norm2 / s1s2
    numerator = jnp.exp(-z / (2 * (1 - rho ** 2)))
    denominator = 2 * math.pi * s1s2 * jnp.sqrt(1 - rho ** 2)
    return numerator / denominator


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1)


def prediction_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    scene_mask: Optional[jnp.ndarray] = None,
    background_rate: float = 0.2,
    keep_batch_dim: bool = False,
) -> jnp.ndarray:
    """Gaussian-mixture NLL on primary tracks.

    inputs:  [T, S, 5] predicted normals of the primaries
    targets: [T, S, 2] ground-truth primary velocities
    """
    t, s = targets.shape[0], targets.shape[1]
    if scene_mask is None:
        scene_mask = jnp.ones((s,), dtype=bool)

    # padded scenes carry zeroed normals (sigma = 0); replace them with a safe
    # unit Gaussian BEFORE the division so neither the loss nor its gradient
    # can produce NaN (0 * inf) on masked lanes
    safe = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0], dtype=inputs.dtype)
    m = scene_mask[None, :, None]
    inputs = jnp.where(m, inputs, safe)
    targets = jnp.where(m, targets, 0.0)

    inputs_bg = jnp.concatenate(
        [
            inputs[..., 0:2],
            jnp.full_like(inputs[..., 2:4], 3.0),
            jnp.zeros_like(inputs[..., 4:5]),
        ],
        axis=-1,
    )
    values = -jnp.log(
        0.01
        + background_rate * gaussian_2d(inputs_bg, targets)
        + (0.99 - background_rate) * gaussian_2d(inputs, targets)
    )  # [T, S]

    if keep_batch_dim:
        return jnp.mean(values, axis=0) * scene_mask  # [S]
    return _masked_mean(values, jnp.broadcast_to(scene_mask[None, :], (t, s)))


def l2_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    scene_mask: Optional[jnp.ndarray] = None,
    keep_batch_dim: bool = False,
    loss_multiplier: float = 100.0,
) -> jnp.ndarray:
    """Primary-only squared error (x100), deterministic PredictionLoss variant."""
    t, s = targets.shape[0], targets.shape[1]
    if scene_mask is None:
        scene_mask = jnp.ones((s,), dtype=bool)
    sq = (inputs[..., 0:2] - targets) ** 2  # [T, S, 2]
    if keep_batch_dim:
        return jnp.mean(sq, axis=(0, 2)) * scene_mask * loss_multiplier
    mask = jnp.broadcast_to(scene_mask[None, :, None], sq.shape)
    return _masked_mean(sq, mask) * loss_multiplier


def collision_loss(
    positions: jnp.ndarray,
    position_mask: jnp.ndarray,
    scene_mask: Optional[jnp.ndarray] = None,
    col_wt: float = 10.0,
    col_distance: float = 0.2,
) -> jnp.ndarray:
    """Hinge penalty when the primary prediction approaches neighbour tracks.

    positions: [T, S, A, 2] (primary = agent 0, neighbours detached here)
    position_mask: [T, S, A] validity of each position
    """
    if scene_mask is None:
        scene_mask = jnp.ones((positions.shape[1],), dtype=bool)
    primary = positions[:, :, 0:1, :]
    neighs = jax.lax.stop_gradient(positions[:, :, 1:, :])
    d = jnp.linalg.norm(primary - neighs, axis=-1)  # [T, S, A-1]
    valid = position_mask[:, :, 0:1] & position_mask[:, :, 1:]
    valid = valid & scene_mask[None, :, None]
    colliding = jax.lax.stop_gradient((d <= col_distance) & valid)
    col_val = (1.0 - d / col_distance) * colliding
    return col_wt * jnp.sum(col_val)


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid BCE, mean-reduced."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.clip(logits, min=0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def gan_g_loss(scores_fake: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Generator loss with smoothed real labels y ~ U(0.7, 1.2)."""
    y_fake = jnp.ones_like(scores_fake) * jax.random.uniform(key, (), minval=0.7, maxval=1.2)
    return bce_loss(scores_fake, y_fake)


def gan_d_loss(scores_real: jnp.ndarray, scores_fake: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Discriminator loss; real labels smoothed, fake labels zero."""
    k1, _ = jax.random.split(key)
    y_real = jnp.ones_like(scores_real) * jax.random.uniform(k1, (), minval=0.7, maxval=1.2)
    y_fake = jnp.zeros_like(scores_fake)
    return bce_loss(scores_real, y_real) + bce_loss(scores_fake, y_fake)


def kld_loss(
    inputs: jnp.ndarray,
    targets: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """KL divergence of diagonal Gaussians given [S, 2*latent] (mu ++ log var).

    Callers pass the primary rows only.  With no target, the prior is the
    standard normal; otherwise the stable two-term form of the reference
    (/root/reference/trajnetbaselines/vae/loss.py:36-52).
    """
    half = inputs.shape[-1] // 2
    z_mu, z_log_var = inputs[..., :half], inputs[..., half:]
    if targets is None:
        latent = -0.5 * jnp.sum(1.0 + z_log_var - z_mu ** 2 - jnp.exp(z_log_var), axis=-1)
    else:
        t_mu, t_log_var = targets[..., :half], targets[..., half:]
        z_var, t_var = jnp.exp(z_log_var), jnp.exp(t_log_var)
        latent = 0.5 * (
            jnp.sum(z_var / t_var, axis=-1) + jnp.sum((t_mu - z_mu) ** 2 / t_var, axis=-1)
        )
    return jnp.mean(latent)
