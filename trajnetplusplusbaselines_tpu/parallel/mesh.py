"""Device mesh construction and sharding rules.

The reference has no distributed training (SURVEY.md section 2.5); this is the
greenfield TPU-native scaling layer: scenes shard over a ``data`` axis (the
reference's scene-concat batching becomes true data parallelism with XLA psum
gradient reduction over ICI), and the LSTM/pool weight matrices optionally
shard their output features over a ``model`` axis (tensor parallelism).
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: int = 1) -> Mesh:
    """A (data, model) mesh over the available devices."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    device_grid = mesh_utils.create_device_mesh((dp, tp), devices=devices[:n])
    return Mesh(device_grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scene axis (axis 1 of [T, S, A, ...]) over the data axis."""
    return NamedSharding(mesh, P(None, "data"))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Leading scene axis (e.g. goals [S, A, 2]) over the data axis."""
    return NamedSharding(mesh, P("data"))


def param_sharding_rule(mesh: Mesh, path: Tuple, leaf) -> NamedSharding:
    """Tensor-parallel layout: shard wide output-feature axes over 'model'.

    LSTM gate projections ([in, 4H]) and large MLP layers shard their last
    axis; everything else replicates.  Falling back to replication whenever
    the axis does not divide keeps the rule total.
    """
    del path  # classification is purely by shape; see docstring
    tp = mesh.shape["model"]
    if (
        tp > 1
        and hasattr(leaf, "ndim")
        and leaf.ndim == 2
        and leaf.shape[-1] % tp == 0
        and leaf.shape[-1] >= 4 * tp
    ):
        return NamedSharding(mesh, P(None, "model"))
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Apply the tensor-parallel rule to a parameter pytree (multi-host-safe)."""
    from .multihost import put_global

    def place(path, leaf):
        return put_global(param_sharding_rule(mesh, path, leaf), leaf)

    return jax.tree_util.tree_map_with_path(
        lambda p, l: place(tuple(getattr(k, "key", getattr(k, "idx", None)) for k in p), l),
        params,
    )
