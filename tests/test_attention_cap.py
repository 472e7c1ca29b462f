"""Attention logit soft-cap (S-Attn training-stability fix, VERDICT r2 #4).

The diagnosed instability (RESULTS.md): trained S-Attn logits reach |600|+
(saturated softmax), and when two competing logits cross, the softmax
Jacobian couples that scale into the score-path gradient (measured 26k-norm
spikes on spatial/hidden/wk while the value path stays at ~20).  The cap
``cap * tanh(logits / cap)`` bounds both the logits and, via tanh' -> 0,
their gradient.  cap=None preserves reference semantics exactly (the oracle
parity test test_parity_lstm.py::test_attentionmlp_parity runs uncapped).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.ops.pooling import AttentionMLPPooling, make_pool


def _setup(logit_cap=None, score_scale=1.0, s=3, a=4):
    pool = AttentionMLPPooling(
        hidden_dim=16, mlp_dim=32, mlp_dim_spatial=8, mlp_dim_vel=8,
        out_dim=24, logit_cap=logit_cap,
    )
    params = pool.init_params(jax.random.PRNGKey(0))
    for k in ("wq", "wk", "in_q", "in_k"):
        params[k] = jax.tree.map(lambda x: x * score_scale, params[k])
    rng = np.random.default_rng(1)
    obs1 = jnp.asarray(rng.normal(size=(s, a, 2)))
    obs2 = obs1 + jnp.asarray(rng.normal(scale=0.3, size=(s, a, 2)))
    present = jnp.ones((s, a), bool)
    hidden = jnp.asarray(rng.normal(size=(s, a, 16)))
    slot = jnp.ones((s, a), bool)
    return pool, params, (hidden, obs1, obs2, present, present, slot)


def test_loose_cap_matches_uncapped():
    """A cap far above the logit scale is numerically a no-op."""
    pool, params, args = _setup()
    out_none, _ = pool.apply(params, None, *args)
    pool.logit_cap = 1e6
    out_cap, _ = pool.apply(params, None, *args)
    np.testing.assert_allclose(
        np.asarray(out_none), np.asarray(out_cap), rtol=1e-5, atol=1e-8
    )


def test_cap_bounds_softmax_logits(monkeypatch):
    """The softmax never sees a logit beyond +-cap (uncapped, the same
    inputs produce logits far past it)."""
    seen = []
    orig = jax.nn.softmax

    def capture(x, axis=-1):
        seen.append(np.asarray(jnp.abs(x).max()))
        return orig(x, axis=axis)

    monkeypatch.setattr(jax.nn, "softmax", capture)

    pool, params, args = _setup(score_scale=6.0)
    pool.apply(params, None, *args)
    uncapped_max = float(seen[-1])
    assert uncapped_max > 10.0  # this input regime genuinely saturates

    pool.logit_cap = 10.0
    pool.apply(params, None, *args)
    assert float(seen[-1]) <= 10.0 + 1e-6


def test_cap_kills_gradient_of_competing_saturated_logits():
    """The spike mechanism in isolation: two large competing logits with
    different values.  Uncapped, the loss gradient w.r.t. the score weight
    grows with the logit scale; capped, tanh' suppresses it."""

    v = jnp.asarray([1.0, -1.0])  # competing neighbours, different values

    def loss(w, cap):
        logits = jnp.asarray([w, 0.999 * w])  # near-tied, large, and both
        if cap is not None:                   # sensitive to w
            logits = cap * jnp.tanh(logits / cap)
        attn = jax.nn.softmax(logits)
        return jnp.sum(attn * v) ** 2

    w = 600.0  # the measured healthy-trained logit scale (RESULTS.md)
    g_uncapped = abs(float(jax.grad(loss)(w, None)))
    g_capped = abs(float(jax.grad(loss)(w, 25.0)))
    assert g_uncapped > 1e-7
    assert g_capped < g_uncapped * 1e-6, (g_capped, g_uncapped)


def test_make_pool_wires_cap():
    args = argparse.Namespace(hidden_dim=128, pool_dim=256, spatial_dim=32,
                              vel_dim=32, attn_logit_cap=17.5)
    pool = make_pool("attentionmlp", args)
    assert pool.logit_cap == 17.5
    args.attn_logit_cap = None
    assert make_pool("attentionmlp", args).logit_cap is None


def test_old_pickles_without_cap_attr_still_apply():
    """Checkpoints from before the cap existed unpickle without the
    attribute; apply() must treat that as cap=None."""
    pool, params, args = _setup()
    want, _ = pool.apply(params, None, *args)
    del pool.logit_cap
    got, _ = pool.apply(params, None, *args)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
