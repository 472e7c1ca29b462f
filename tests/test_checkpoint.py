

def test_old_pickle_missing_new_attrs_still_works():
    """Checkpoints pickled before newer config attributes existed must keep
    loading: unpickling bypasses __init__, so new attributes need class-level
    defaults (round-2 social checkpoints broke on scatter_impl)."""
    import pickle

    from trajnetplusplusbaselines_tpu.ops.pooling.grid import GridBasedPooling

    pool = GridBasedPooling(type_="directional", n=4, cell_side=0.6)
    pool.__dict__.pop("scatter_impl", None)  # simulate a pre-round-3 pickle
    restored = pickle.loads(pickle.dumps(pool))
    assert restored.scatter_impl is None  # class default takes over
    import numpy as np

    import jax
    import jax.numpy as jnp

    params = restored.init_params(jax.random.PRNGKey(0))
    s, a = 2, 3
    hidden = jnp.zeros((s, a, 128))
    obs1 = jnp.zeros((s, a, 2))
    obs2 = jnp.asarray(np.random.default_rng(0).normal(size=(s, a, 2)))
    present = jnp.ones((s, a), bool)
    out, _ = restored.apply(params, None, hidden, obs1, obs2, present, present)
    assert np.isfinite(np.asarray(out)).all()
