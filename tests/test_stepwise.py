"""forward_stepwise (python-driven jitted steps) == forward (scanned rollout).

The evaluator routes deep grid embeddings through forward_stepwise because
the remote AOT compiler cannot schedule their scanned rollout (models/lstm.py
docstring).  Exactness here is what makes that routing sound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.models.lstm import LSTM
from trajnetplusplusbaselines_tpu.ops.pooling import GridBasedPooling


@pytest.mark.parametrize("type_,kw", [
    ("social", dict(n=16, embedding_arch="two_layer", layer_dims=[1024],
                    latent_dim=16)),
    ("directional", dict(n=12)),
])
def test_stepwise_matches_scan(type_, kw):
    pool = GridBasedPooling(type_=type_, hidden_dim=128, cell_side=0.6,
                            out_dim=256, **kw)
    model = LSTM(pool=pool, embedding_dim=64, hidden_dim=128)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    s, a = 3, 5
    xy = jnp.asarray(rng.normal(size=(9, s, a, 2)))
    mask = rng.random((9, s, a)) > 0.2
    mask[:, :, 0] = True
    mask = jnp.asarray(mask)
    goals = jnp.zeros((s, a, 2))
    slot = jnp.ones((s, a), bool)

    r1, p1, v1 = model.forward(params, xy, mask, goals, slot, n_predict=12)
    cache = {}
    r2, p2, v2 = model.forward_stepwise(params, xy, mask, goals, slot,
                                        n_predict=12, jit_cache=cache)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-12, rtol=0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-12, rtol=0)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert set(cache) == {"encoder", "decoder"}  # one jitted step per cell

    for segment in (4, 5):
        seg_cache = {}
        r3, p3, v3 = model.forward_segmented(
            params, xy, mask, goals, slot, n_predict=12, segment=segment,
            jit_cache=seg_cache,
        )
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r3), atol=1e-12, rtol=0)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p3), atol=1e-12, rtol=0)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v3))
        # one program per (cell, segment-length): 8 enc transitions and 11
        # dec steps decompose into at most two lengths each
        assert all(key[0] in ("enc", "dec") for key in seg_cache)
        assert len(seg_cache) <= 4
