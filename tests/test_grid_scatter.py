"""Large-A grid scatter (scatter-max + gather) vs the select-chain semantics.

Evaluation predicts full scenes (up to 128 agents, no drop_distant), where the
unrolled per-neighbour select chain made the remote-TPU compile pathologically
slow (grid.py:make_grid docstring).  The vectorized path must reproduce the
chain bit-for-bit — including last-write-wins cell collisions and
out-of-range writes of `constant` into cell 0 — and carry the same gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.ops.pooling.grid import GridBasedPooling


def _chain_grid(pool, hidden, obs1, obs2, p1, p2, params):
    """The ascending-j select chain, written out independently of make_grid."""
    s, a = obs2.shape[:2]
    values = pool._grid_values(hidden, obs1, obs2, p1, p2, params)
    d = values.shape[-1]
    rel = obs2[:, None, :, :] - obs2[:, :, None, :]
    oij = rel / pool.cell_side + pool.n / 2.0
    visible = p2[:, None, :] & p2[:, :, None]
    not_self = ~jnp.eye(a, dtype=bool)[None]
    in_range = jnp.all((oij >= 0) & (oij < pool.n), axis=-1) & visible & not_self
    cell = jnp.floor(oij).astype(jnp.int32)
    flat = cell[..., 0] * pool.n + cell[..., 1]
    wc = jnp.where(in_range, flat, 0)
    wv = jnp.where(in_range[..., None], values, pool.constant)
    cell_iota = jnp.arange(pool.n * pool.n)
    grid = jnp.full((s, a, pool.n * pool.n, d), pool.constant, dtype=values.dtype)
    for j in range(a):
        hit = (wc[:, :, j, None] == cell_iota) & not_self[:, :, j, None]
        grid = jnp.where(hit[..., None], wv[:, :, j, None, :], grid)
    return jnp.moveaxis(grid.reshape(s, a, pool.n, pool.n, d), -1, 2)


def _setup(type_, a, s=5, seed=0, **kw):
    rng = np.random.default_rng(seed)
    pool = GridBasedPooling(type_=type_, hidden_dim=32, cell_side=0.6, n=12,
                            out_dim=64, **kw)
    params = pool.init_params(jax.random.PRNGKey(1))
    obs1 = rng.normal(size=(s, a, 2)) * 2
    obs2 = obs1 + rng.normal(size=(s, a, 2)) * 0.5
    obs2[:, a // 2:] = obs2[:, :1] + rng.normal(size=(s, a - a // 2, 2)) * 0.3
    p1 = rng.random((s, a)) > 0.2
    p2 = rng.random((s, a)) > 0.2
    hidden = rng.normal(size=(s, a, 32))
    return pool, params, (jnp.asarray(hidden), jnp.asarray(obs1),
                          jnp.asarray(obs2), jnp.asarray(p1), jnp.asarray(p2))


@pytest.mark.parametrize("impl", ["scatter_max", "argmax_gather", "argmax_matmul", "argmax_sum"])
@pytest.mark.parametrize("type_", ["occupancy", "directional", "social", "dir_social"])
@pytest.mark.parametrize("a", [18, 33, 64])
def test_vectorized_impls_equal_chain(impl, type_, a):
    kw = {"latent_dim": 16} if type_ in ("social", "dir_social") else {}
    pool, params, args = _setup(type_, a, **kw)
    pool.scatter_impl = impl
    got = pool.make_grid(*args, params)
    want = _chain_grid(pool, *args, params)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("impl", ["scatter_max", "argmax_gather", "argmax_matmul", "argmax_sum"])
def test_vectorized_gradients_match_chain(impl):
    pool, params, args = _setup("directional", 24, seed=3)
    pool.scatter_impl = impl
    hidden, obs1, obs2, p1, p2 = args

    def loss_vectorized(o2):
        return jnp.sum(pool.make_grid(hidden, obs1, o2, p1, p2, params) ** 2)

    def loss_chain(o2):
        return jnp.sum(_chain_grid(pool, hidden, obs1, o2, p1, p2, params) ** 2)

    g_vectorized = jax.grad(loss_vectorized)(obs2)
    g_chain = jax.grad(loss_chain)(obs2)
    np.testing.assert_allclose(np.asarray(g_vectorized), np.asarray(g_chain),
                               atol=1e-12, rtol=1e-12)


def test_small_a_still_uses_chain():
    """The proven chain stays in place at the hot benchmark shape (A=8)."""
    pool, params, args = _setup("directional", 8)
    got = pool.make_grid(*args, params)
    want = _chain_grid(pool, *args, params)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
