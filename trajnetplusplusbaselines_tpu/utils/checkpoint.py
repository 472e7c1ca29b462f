"""Checkpointing: whole-predictor pickles plus a training-state sidecar.

Mirrors the reference's two-file scheme
(/root/reference/trajnetbaselines/lstm/lstm.py:266-282 and trainer.py:62-76):
``<out>`` holds the inference predictor, ``<out>.state`` holds
{epoch, params, optimizer state, scheduler state} for resume.  Parameters are
stored as host numpy pytrees so checkpoints are device-independent.

Restore modes (trainer flags, SURVEY.md section 5.4):
- load-state: weights only (transfer learning)
- nonstrict-load-state: weights whose names/shapes still match
- load-full-state: weights + optimizer + scheduler + epoch
"""

import pickle
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _to_host(tree):
    """Fetch a pytree to host numpy; multi-host-safe.

    Leaves TP-sharded across hosts are not fully addressable from any single
    process, so a bare ``device_get`` raises; those leaves are allgathered to
    every host instead (a collective — every process must reach the save
    call, which the SPMD trainer loops guarantee).  File writes are then
    gated on process 0 (save_predictor / save_orbax)."""

    def fetch(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            from jax.experimental import multihost_utils

            # tiled=True is required for non-fully-addressable inputs; the
            # result is the fully-replicated global value on every process
            return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
        return np.asarray(jax.device_get(leaf))

    return jax.tree.map(fetch, tree)


def save_predictor(predictor, state, filename: str) -> None:
    # the gathers inside _to_host are collectives: run them on EVERY process,
    # then let only process 0 touch the (shared) filesystem
    payload = {
        "predictor_class": type(predictor).__name__,
        "model": predictor.model,
        "params": _to_host(predictor.params),
    }
    host_state = _to_host(state) if state is not None else None
    if jax.process_index() != 0:
        return
    with open(filename, "wb") as f:
        pickle.dump(payload, f)
    if host_state is not None:
        with open(filename + ".state", "wb") as f:
            pickle.dump(host_state, f)


def load_predictor(filename: str):
    with open(filename, "rb") as f:
        payload = pickle.load(f)

    from ..models import lstm as lstm_mod
    from ..models import sgan as sgan_mod
    from ..models import vae as vae_mod

    classes = {
        "LSTMPredictor": lstm_mod.LSTMPredictor,
        "SGANPredictor": sgan_mod.SGANPredictor,
        "VAEPredictor": vae_mod.VAEPredictor,
    }
    cls = classes[payload["predictor_class"]]
    return cls(payload["model"], payload["params"])


def load_state(filename: str) -> Dict:
    """Training-state restore: pickle sidecar, or an Orbax directory.

    All three trainer restore flags accept either format — a path ending in
    ``.orbax`` (or any directory) loads through the Orbax backend.
    """
    import os

    if os.path.isdir(filename):
        return load_orbax(filename)
    with open(filename, "rb") as f:
        return pickle.load(f)


def save_orbax(state: Dict, directory: str) -> None:
    """Orbax backend for training state (atomic, async-capable, sharded).

    The pickle path above matches the reference's artifact layout; this is
    the TPU-native alternative for large multi-host runs (SURVEY.md §5.4).
    """
    import os

    import orbax.checkpoint as ocp

    host_state = _to_host(state)  # collective: every process gathers
    if jax.process_index() != 0:
        return
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(os.path.abspath(directory), host_state, force=True)


def load_orbax(directory: str, item=None) -> Dict:
    """Restore an Orbax state dir; ``item`` (a template pytree) restores
    directly into that structure instead of plain dicts."""
    import os

    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(os.path.abspath(directory), item=item)


def load_full_state(path: str, template=None) -> Dict:
    """Full-state restore for --load-full-state: pickle file or Orbax dir.

    ``template`` (the trainer's live state dict, same keys as its
    save_checkpoint) makes an Orbax restore land directly in the optimizer's
    NamedTuple structure — no reliance on dict-key order.
    """
    import os

    if os.path.isdir(path):
        return load_orbax(path, item=template)
    return load_state(path)


def restore_opt_state(restored, opt_state_template):
    """Re-seat a restored optimizer state in the optimizer's pytree structure.

    Pass-through when the structure already matches (pickle restores, or
    Orbax restores that went through a ``template``).  The unflatten
    fallback covers legacy Orbax dirs restored WITHOUT a template, where
    NamedTuples came back as plain dicts; it assumes the alphabetical
    leaf order matches field order (true for the optax chain
    make_optimizer builds) and fails loudly on a leaf-count mismatch.
    """
    import jax
    import jax.numpy as jnp

    restored = jax.tree.map(jnp.asarray, restored)
    target = jax.tree.structure(opt_state_template)
    if jax.tree.structure(restored) == target:
        return restored
    leaves = jax.tree.leaves(restored)
    if len(leaves) != target.num_leaves:
        # a safety check, not a debug assert: must survive python -O
        raise ValueError(
            f"restored opt_state has {len(leaves)} leaves, optimizer expects "
            f"{target.num_leaves}"
        )
    return jax.tree.unflatten(target, leaves)


def merge_params_nonstrict(init_params, loaded_params) -> Tuple[Any, list]:
    """Copy loaded leaves whose path and shape match; report the rest."""
    skipped = []

    def merge(path, init_leaf, tree):
        node = tree
        for p in path:
            if isinstance(node, dict) and p in node:
                node = node[p]
            elif isinstance(node, (list, tuple)) and isinstance(p, int) and p < len(node):
                node = node[p]
            else:
                skipped.append("/".join(map(str, path)))
                return init_leaf
        if hasattr(node, "shape") and hasattr(init_leaf, "shape") and node.shape == init_leaf.shape:
            return node
        skipped.append("/".join(map(str, path)))
        return init_leaf

    def walk(path, node):
        if isinstance(node, dict):
            return {k: walk(path + (k,), v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(path + (i,), v) for i, v in enumerate(node)]
        if isinstance(node, tuple):
            return tuple(walk(path + (i,), v) for i, v in enumerate(node))
        return merge(path, node, loaded_params)

    return walk((), init_params), skipped
