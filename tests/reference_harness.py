"""Load the reference PyTorch implementation for behavioural parity tests.

The reference (read-only at /root/reference) depends on the external
``trajnetplusplustools`` package, which is not installed; we satisfy the
import with a stub backed by this framework's own data layer.  Nothing from
the reference is copied — it is *executed* as a golden oracle.
"""

import sys
import types

import numpy as np


def load_reference():
    if "trajnetbaselines" in sys.modules:
        return sys.modules["trajnetbaselines"]

    import trajnetplusplusbaselines_tpu.data as tdata
    import trajnetplusplusbaselines_tpu.metrics.trajectory as tmetrics

    stub = types.ModuleType("trajnetplusplustools")
    stub.Reader = tdata.Reader
    stub.TrackRow = tdata.TrackRow
    stub.SceneRow = tdata.SceneRow
    stub.writers = tdata.writers
    stub.metrics = types.ModuleType("trajnetplusplustools.metrics")
    stub.metrics.average_l2 = tmetrics.average_l2
    stub.metrics.final_l2 = tmetrics.final_l2
    stub.metrics.collision = tmetrics.collision
    stub.metrics.topk = tmetrics.topk
    stub.metrics.nll = tmetrics.nll
    stub.data = types.ModuleType("trajnetplusplustools.data")
    stub.data.TrackRow = tdata.TrackRow
    stub.data.SceneRow = tdata.SceneRow
    stub.show = types.ModuleType("trajnetplusplustools.show")  # plotting, unused
    stub.interactions = types.ModuleType("trajnetplusplustools.interactions")
    sys.modules["trajnetplusplustools"] = stub
    sys.modules["trajnetplusplustools.metrics"] = stub.metrics
    sys.modules["trajnetplusplustools.data"] = stub.data
    sys.modules["trajnetplusplustools.show"] = stub.show
    sys.modules["trajnetplusplustools.interactions"] = stub.interactions

    # native/sim dependencies of the classical predictors; only needed at
    # call time, so import-level placeholders suffice for the parity tests
    sf = types.ModuleType("socialforce")
    sf.Simulator = object
    sf.potentials = types.ModuleType("socialforce.potentials")
    sf.potentials.PedPedPotential = object
    sf.field_of_view = types.ModuleType("socialforce.field_of_view")
    sf.field_of_view.FieldOfView = object
    sys.modules.setdefault("socialforce", sf)
    sys.modules.setdefault("socialforce.potentials", sf.potentials)
    sys.modules.setdefault("socialforce.field_of_view", sf.field_of_view)
    rvo2 = types.ModuleType("rvo2")
    rvo2.PyRVOSimulator = object
    sys.modules.setdefault("rvo2", rvo2)
    pykalman = types.ModuleType("pykalman")
    pykalman.KalmanFilter = object
    sys.modules.setdefault("pykalman", pykalman)

    sys.path.insert(0, "/root/reference")
    import trajnetbaselines  # noqa: F401

    return sys.modules["trajnetbaselines"]


def torch_linear_to_jax(linear):
    """torch nn.Linear -> this framework's {'w', 'b'} layout."""
    out = {"w": linear.weight.detach().numpy().T.copy()}
    if linear.bias is not None:
        out["b"] = linear.bias.detach().numpy().copy()
    return out


def torch_lstmcell_to_jax(cell):
    return {
        "w_ih": cell.weight_ih.detach().numpy().T.copy(),
        "w_hh": cell.weight_hh.detach().numpy().T.copy(),
        "b_ih": cell.bias_ih.detach().numpy().copy(),
        "b_hh": cell.bias_hh.detach().numpy().copy(),
    }


def copy_lstm_weights(ref_model, params):
    """Copy a reference LSTM/generator's torch weights into a params pytree."""
    params = dict(params)
    params["input_embedding"] = {
        "linear": torch_linear_to_jax(ref_model.input_embedding.input_embeddings[0])
    }
    params["goal_embedding"] = {
        "linear": torch_linear_to_jax(ref_model.goal_embedding.input_embeddings[0])
    }
    params["encoder"] = torch_lstmcell_to_jax(ref_model.encoder)
    if hasattr(ref_model, "decoder"):
        params["decoder"] = torch_lstmcell_to_jax(ref_model.decoder)
    params["hidden2normal"] = {
        "linear": torch_linear_to_jax(ref_model.hidden2normal.linear)
    }
    return params


def copy_sgan_weights(ref_sgan, params):
    """Copy a reference SGAN's torch weights into a {generator, discriminator}
    params pytree (reference modules at sgan/sgan.py:135-200, :405-446)."""
    import torch

    gen = copy_lstm_weights(ref_sgan.generator, params["generator"])
    gen["mlp_decoder_context"] = [
        torch_linear_to_jax(m)
        for m in ref_sgan.generator.mlp_decoder_context
        if isinstance(m, torch.nn.Linear)
    ]

    disc = dict(params["discriminator"])
    rd = ref_sgan.discriminator
    disc["input_embedding"] = {
        "linear": torch_linear_to_jax(rd.input_embedding.input_embeddings[0])
    }
    disc["goal_embedding"] = {
        "linear": torch_linear_to_jax(rd.goal_embedding.input_embeddings[0])
    }
    disc["encoder"] = torch_lstmcell_to_jax(rd.encoder)
    disc["real_classifier"] = [
        torch_linear_to_jax(m) for m in rd.real_classifier if isinstance(m, torch.nn.Linear)
    ]
    return {"generator": gen, "discriminator": disc}


def copy_vae_weights(ref_vae, params):
    """Copy a reference VAE's torch weights (vae/vae.py:26-107) into a params
    pytree; the reference's obs_encoder maps to this framework's 'encoder'."""
    params = dict(params)
    params["input_embedding"] = {
        "linear": torch_linear_to_jax(ref_vae.input_embedding.input_embeddings[0])
    }
    params["goal_embedding"] = {
        "linear": torch_linear_to_jax(ref_vae.goal_embedding.input_embeddings[0])
    }
    params["encoder"] = torch_lstmcell_to_jax(ref_vae.obs_encoder)
    params["pred_encoder"] = torch_lstmcell_to_jax(ref_vae.pred_encoder)
    params["decoder"] = torch_lstmcell_to_jax(ref_vae.decoder)
    params["hidden2normal"] = {"linear": torch_linear_to_jax(ref_vae.hidden2normal.linear)}
    params["vae_encoder_xy"] = {
        "fc_mu": torch_linear_to_jax(ref_vae.vae_encoder_xy.fc_mu),
        "fc_var": torch_linear_to_jax(ref_vae.vae_encoder_xy.fc_var),
    }
    params["vae_encoder_x"] = {
        "fc_mu": torch_linear_to_jax(ref_vae.vae_encoder_x.fc_mu),
        "fc_var": torch_linear_to_jax(ref_vae.vae_encoder_x.fc_var),
    }
    params["vae_decoder"] = torch_linear_to_jax(ref_vae.vae_decoder.fc)
    return params


def copy_grid_pool_weights(ref_pool, pool_params):
    pool_params = dict(pool_params)
    if hasattr(ref_pool, "hidden_dim_encoding"):
        pool_params["hidden_dim_encoding"] = torch_linear_to_jax(ref_pool.hidden_dim_encoding)
    if ref_pool.embedding is not None:
        import torch

        linears = [m for m in ref_pool.embedding if isinstance(m, torch.nn.Linear)]
        pool_params["embedding"] = [torch_linear_to_jax(m) for m in linears]
    if hasattr(ref_pool, "pool_lstm"):  # embedding_arch == 'lstm_layer'
        pool_params["pool_lstm"] = torch_lstmcell_to_jax(ref_pool.pool_lstm)
        pool_params["hidden2pool"] = torch_linear_to_jax(ref_pool.hidden2pool)
    return pool_params


def random_scene(rng, t, a, nan_pattern=True):
    """A [T, A, 2] scene with reference-style NaN gaps (primary complete)."""
    xy = rng.normal(size=(t, a, 2)).cumsum(axis=0) * 0.3
    xy = xy.astype(np.float64)
    if nan_pattern and a > 2:
        xy[: t // 3, 1] = np.nan  # appears late
        xy[2 * t // 3 :, 2] = np.nan  # leaves early
    return xy
