"""Input embedding and Gaussian output head.

Behavioural mirror of /root/reference/trajnetbaselines/lstm/modules.py:4-64:
- InputEmbedding: linear+ReLU on scaled velocities, with two trailing zero
  "tag" channels (start_enc / start_dec set one of them to 1).
- Hidden2Normal: hidden state -> (mu_x, mu_y, sigma_1, sigma_2, rho) with
  sigmoid-bounded sigma in [0.01, 0.21] and rho in [0, 0.7].

Static configuration (scale, tag usage, dims) is passed as plain arguments so
parameter pytrees stay pure arrays for jit/optax.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from .core import init_linear, linear


def init_input_embedding(key, input_dim: int, embedding_dim: int,
                         use_tags: bool = True) -> Dict:
    linear_dim = embedding_dim - 2 if use_tags else embedding_dim
    return {"linear": init_linear(key, input_dim, linear_dim)}


def input_embedding(params: Dict, vel: jnp.ndarray, scale: float = 4.0,
                    use_tags: bool = True) -> jnp.ndarray:
    emb = jax.nn.relu(linear(params["linear"], vel * scale))
    if not use_tags:
        return emb
    tags = jnp.zeros(vel.shape[:-1] + (2,), dtype=emb.dtype)
    return jnp.concatenate([emb, tags], axis=-1)


def start_enc(vel: jnp.ndarray, embedding_dim: int) -> jnp.ndarray:
    """Encoder start tag: one-hot on the second-to-last channel."""
    v = jnp.zeros(vel.shape[:-1] + (embedding_dim,))
    return v.at[..., -2].set(1.0)


def start_dec(vel: jnp.ndarray, embedding_dim: int) -> jnp.ndarray:
    """Decoder start tag: one-hot on the last channel."""
    v = jnp.zeros(vel.shape[:-1] + (embedding_dim,))
    return v.at[..., -1].set(1.0)


def init_hidden2normal(key, hidden_dim: int) -> Dict:
    return {"linear": init_linear(key, hidden_dim, 5)}


def hidden2normal(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    raw = linear(params["linear"], hidden)
    mu = raw[..., 0:2]
    sigma = 0.01 + 0.2 * jax.nn.sigmoid(raw[..., 2:4])
    rho = 0.7 * jax.nn.sigmoid(raw[..., 4:5])
    return jnp.concatenate([mu, sigma, rho], axis=-1)
