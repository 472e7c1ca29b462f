"""Shared trainer infrastructure: data pipeline, logging, optimizer, schedule.

Mirrors the trainer-side plumbing of /root/reference/trajnetbaselines/lstm/trainer.py
(scene loading :96-133, JSON logging :429-444, Adam+StepLR :497-500,
checkpoint restore :508-523) in a TPU-friendly shape: scenes are converted to
arrays and drop_distant-filtered ONCE at load; per-epoch augmentation is
host-side numpy; batches pack into dense [T, S, A] buckets so XLA compiles a
handful of executables.
"""

import json
import logging
import os
import socket
import sys
import time
from typing import List, Optional, Sequence

import numpy as np
import optax

from ..data import augmentation, batching
from ..data.reader import Reader


def enable_compilation_cache(directory: str = ".jax_cache") -> None:
    """Persistent XLA compilation cache (shared across seed-sweep runs).

    The published protocol trains 5 seeds per configuration with identical
    shapes; caching the compiled executables on disk makes every run after
    the first skip TPU compilation entirely.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(directory))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without the knobs
        logging.getLogger(__name__).warning("persistent compilation cache unavailable")


# Device-side epoch scan: batches with identical static shapes are stacked and
# processed by ONE jitted lax.scan dispatch instead of one dispatch per batch.
# Through the remote-TPU tunnel a single dispatch costs ~20-40 ms of latency;
# an epoch is ~1300 batches, so per-batch dispatch dominates wall-clock by
# ~50x over the actual compute.  Chunking the per-group batch count into a
# fixed ladder keeps the number of distinct compiled executables small.
CHUNK_SIZES = (256, 32, 4, 1)

# Unroll factor for the per-batch scan inside the resident-epoch runner.
# Batches are a sequential SGD chain, so unrolling only widens XLA's
# scheduling window (gathers/augmentation of batch k+1 can overlap batch k's
# update); measured neutral-to-slightly-positive on the v5e, kept at 1 until
# a sweep shows a real win (bench /tmp experiments round 3).
EPOCH_SCAN_UNROLL = 1


def chunk_sizes_for(n: int, sizes: Sequence[int] = CHUNK_SIZES) -> List[int]:
    """Greedy fixed-size decomposition of n (e.g. 300 -> [256, 32, 4, 4, 4])."""
    out: List[int] = []
    for s in sizes:
        while n >= s:
            out.append(s)
            n -= s
    return out


def group_batches(items, key_fn):
    """Group a list of per-batch items by their static-shape key."""
    groups = {}
    for item in items:
        groups.setdefault(key_fn(item), []).append(item)
    return groups


class ResidentDataset:
    """Scenes resident in device HBM, one dense array set per (T, A-bucket).

    The remote-TPU tunnel moves ~5 MB/s, so re-uploading every augmented batch
    (~30 MB/epoch) dominated training wall-clock.  Here the raw scenes upload
    ONCE; per epoch the host sends only a shuffled batch-index plan (KBs) and
    a PRNG key, and rotation/noise augmentation, scene gathering and every
    optimizer step run inside one jitted lax.scan dispatch per bucket
    (``make_bucket_epoch_runner``).  This is the TPU-native replacement for
    the reference's per-scene host pipeline
    (/root/reference/trajnetbaselines/lstm/trainer.py:96-133).

    Note: batches are formed within a bucket (scenes of similar agent count
    train together) rather than across the whole shuffled stream; scene order
    within a bucket and bucket visit order reshuffle every epoch.
    """

    def __init__(self, dataset: "SceneDataset",
                 buckets: Sequence[int] = batching.DEFAULT_AGENT_BUCKETS):
        import jax.numpy as jnp

        by_key = {}
        for i, xy in enumerate(dataset.xys):
            t, n = xy.shape[0], xy.shape[1]
            a = max(batching.agent_bucket(n, buckets), n)
            by_key.setdefault((t, a), []).append(i)

        self.buckets = {}
        for (t, a), ids in sorted(by_key.items()):
            n_scenes = len(ids)
            xs = np.zeros((n_scenes, t, a, 2), dtype=np.float32)
            mask = np.zeros((n_scenes, t, a), dtype=bool)
            goals = np.zeros((n_scenes, a, 2), dtype=np.float32)
            num_agents = np.zeros((n_scenes,), dtype=np.int32)
            for j, i in enumerate(ids):
                xy, goal = dataset.xys[i], dataset.goals[i]
                n = xy.shape[1]
                vals, m = batching.nan_to_mask(xy)
                xs[j, :, :n] = vals
                mask[j, :, :n] = m
                goals[j, :n] = goal
                num_agents[j] = n
            self.buckets[(t, a)] = {
                "xs": jnp.asarray(xs),
                "mask": jnp.asarray(mask),
                "goals": jnp.asarray(goals),
                "num_agents": jnp.asarray(num_agents),
            }

    def place(self, mesh) -> None:
        """Replicate the resident arrays over a device mesh.

        Multi-chip training shards the per-step *batch* axis over the mesh's
        'data' axis (see Trainer._resident_epoch); the resident scene store
        stays replicated so the per-batch scene gathers ``xs[i]`` remain
        device-local (the whole dataset is a few MB — scenes are short — so
        replication costs nothing and avoids an all-to-all per batch).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.multihost import put_global

        replicated = NamedSharding(mesh, P())
        for key, data in self.buckets.items():
            self.buckets[key] = {
                k: put_global(replicated, v) for k, v in data.items()
            }

    def epoch_plan(self, batch_size: int, rng: np.random.Generator,
                   shuffle: bool = True):
        """Per bucket: (idx [nb, S] int32, valid [nb, S] bool); nb is constant
        across epochs so each bucket reuses one compiled executable."""
        plan = {}
        for key, data in self.buckets.items():
            n = int(data["num_agents"].shape[0])
            order = rng.permutation(n) if shuffle else np.arange(n)
            nb = -(-n // batch_size)
            idx = np.zeros((nb * batch_size,), dtype=np.int32)
            idx[:n] = order
            valid = np.arange(nb * batch_size) < n
            plan[key] = (idx.reshape(nb, batch_size), valid.reshape(nb, batch_size))
        return plan


def make_bucket_epoch_runner(step_core, augment: bool = False,
                             augment_noise: bool = False,
                             noise_thresh: float = 0.02, obs_length: int = 9,
                             ensemble: bool = False):
    """One jitted dispatch running a whole epoch over one resident bucket.

    ``step_core(carry, xy [T,S,A,2], mask [T,S,A], goals [S,A,2],
    slot_mask [S,A], scene_mask [S], key) -> (carry, out)`` is scanned over
    the batch plan; augmentation (uniform scene rotation, neighbour noise on
    observed frames — mirrors data/augmentation.py random_rotation/add_noise)
    happens on device from the passed PRNG key.

    With ``ensemble=True`` the returned function expects a leading member
    axis on ``carry``/``idx``/``valid``/``key`` (and any extras) and trains
    every member in one dispatch — each member has its own shuffle order,
    augmentation draws and parameters, sharing only the resident scene
    arrays.  This is the SURVEY §2.5 TPU-native replacement for sequential
    per-seed shell sweeps.
    """
    import jax
    import jax.numpy as jnp

    def rotate(xy, theta):
        # xy [..., 2] @ [[ct, st], [-st, ct]] per scene (augmentation.theta_rotation)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        x, y = xy[..., 0], xy[..., 1]
        return jnp.stack([x * ct - y * st, x * st + y * ct], axis=-1)

    def run_one(carry, xs, mask, goals, num_agents, idx, valid, key, *extras):
        if augment:
            key, k = jax.random.split(key)
            theta = jax.random.uniform(
                k, (xs.shape[0],), xs.dtype, 0.0, 2.0 * np.pi
            )
            xs = rotate(xs, theta[:, None, None])
            goals = rotate(goals, theta[:, None])
        if augment_noise:
            key, k = jax.random.split(key)
            noise = jax.random.uniform(
                k, xs[:, :obs_length, 1:].shape, xs.dtype, -noise_thresh, noise_thresh
            )
            xs = xs.at[:, :obs_length, 1:].add(noise)
        slot_all = jnp.arange(xs.shape[2])[None] < num_agents[:, None]  # [N, A]

        def body(carry_key, batch):
            carry, key = carry_key
            i, v = batch[0], batch[1]  # [S] int32, [S] bool
            xy = jnp.transpose(xs[i], (1, 0, 2, 3))  # [T, S, A, 2]
            m = jnp.transpose(mask[i], (1, 0, 2)) & v[None, :, None]
            slot = slot_all[i] & v[:, None]
            scene = (num_agents[i] > 0) & v
            key, sub = jax.random.split(key)
            carry, out = step_core(carry, xy, m, goals[i], slot, scene, sub, *batch[2:])
            return (carry, key), out

        (carry, _), outs = jax.lax.scan(
            body, (carry, key), (idx, valid) + extras,
            unroll=EPOCH_SCAN_UNROLL,
        )
        return carry, outs

    if not ensemble:
        return jax.jit(run_one, donate_argnums=(0,))

    def run_members(carries, xs, mask, goals, num_agents, idxs, valids, keys,
                    *extras):
        member = lambda carry, idx, valid, key, *ex: run_one(
            carry, xs, mask, goals, num_agents, idx, valid, key, *ex
        )
        return jax.vmap(
            member, in_axes=(0, 0, 0, 0) + (0,) * len(extras)
        )(carries, idxs, valids, keys, *extras)

    return jax.jit(run_members, donate_argnums=(0,))


def stack_packed(chunk: List[batching.PackedScenes]):
    """Stack PackedScenes batches into [B, ...] arrays + derived masks.

    Returns (xy [B,T,S,A,2], mask [B,T,S,A], goals [B,S,A,2],
    slot_mask [B,S,A], scene_mask [B,S]).
    """
    xy = np.stack([p.xy for p in chunk])
    mask = np.stack([p.mask for p in chunk])
    goals = np.stack([p.goals for p in chunk])
    num_agents = np.stack([p.num_agents for p in chunk])  # [B, S]
    slot_mask = np.arange(xy.shape[3])[None, None] < num_agents[..., None]
    scene_mask = num_agents > 0
    return xy, mask, goals, slot_mask, scene_mask


class JsonFormatter(logging.Formatter):
    """Single-line JSON records (stands in for pythonjsonlogger)."""

    def format(self, record):
        payload = {}
        if isinstance(record.msg, dict):
            payload.update(record.msg)
        else:
            payload["message"] = record.getMessage()
        payload.update(
            {
                "levelname": record.levelname,
                "name": record.name,
                "asctime": self.formatTime(record),
            }
        )
        return json.dumps(payload)


def setup_logging(output: str, append: bool = False) -> None:
    file_handler = logging.FileHandler(output + ".log", mode="a" if append else "w")
    file_handler.setFormatter(JsonFormatter())
    stdout_handler = logging.StreamHandler(sys.stdout)
    logging.basicConfig(level=logging.INFO, handlers=[stdout_handler, file_handler], force=True)


def log_process_record(args, version: str) -> None:
    logging.info(
        {
            "type": "process",
            "argv": sys.argv,
            "args": vars(args),
            "version": version,
            "hostname": socket.gethostname(),
        }
    )


class SceneDataset:
    """Preprocessed scenes held as arrays; augmentation applied per epoch."""

    def __init__(self, scenes, goals_dict, obs_length: int, normalize_scene: bool):
        self.xys: List[np.ndarray] = []
        self.goals: List[np.ndarray] = []
        for filename, scene_id, paths in scenes:
            xy = Reader.paths_to_xy(paths)
            if goals_dict is not None:
                goal = np.array(goals_dict[filename][scene_id])
            else:
                goal = np.zeros((xy.shape[1], 2))
            xy, mask = augmentation.drop_distant(xy)
            goal = goal[mask]
            if normalize_scene:
                xy, _, _, goal = augmentation.center_scene(xy, obs_length, goals=goal)
            self.xys.append(xy.astype(np.float64))
            self.goals.append(goal.astype(np.float64))

    def __len__(self):
        return len(self.xys)

    def epoch_batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        augment: bool = False,
        augment_noise: bool = False,
        shuffle: bool = True,
    ):
        """Yield PackedScenes with per-epoch augmentation applied."""
        order = rng.permutation(len(self.xys)) if shuffle else np.arange(len(self.xys))
        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            xs, gs = [], []
            for i in idx:
                xy, goal = self.xys[i], self.goals[i]
                if augment:
                    xy, goal = augmentation.random_rotation(xy, goals=goal, rng=rng)
                if augment_noise:
                    xy = augmentation.add_noise(xy.copy(), thresh=0.02, ped="neigh", rng=rng)
                xs.append(xy)
                gs.append(goal)
            yield batching.pack_scenes(xs, gs, pad_scenes_to=batch_size)


def validate_mesh_batch(mesh, batch_size: int) -> None:
    """Mesh batches shard scene-wise: batch_size must divide over 'data'."""
    if mesh is not None and batch_size % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch_size {batch_size} must divide over data axis "
            f"{mesh.shape['data']}"
        )


def place_plan_on_mesh(mesh, idx, valid):
    """Shard an epoch plan's [nb, S] index/valid arrays over the data axis.

    Multi-host: every process builds the identical plan (the epoch RNG is
    seeded the same on all hosts) and put_global materializes only the
    addressable shards; a digest check turns cross-host seed drift into a
    loud failure instead of a silently-wrong gather.  mesh=None is the
    single-device fast path (plain device transfer).
    """
    import jax
    import jax.numpy as jnp

    if mesh is None:
        return jnp.asarray(idx), jnp.asarray(valid)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.multihost import all_processes_agree, put_global

    if jax.process_count() > 1:
        # Order-sensitive digest: a sha256 over the raw bytes catches
        # shuffle-order drift, which sum-based digests are blind to (any
        # permutation of the same scene indices has identical sums).
        import hashlib

        h = hashlib.sha256(
            np.ascontiguousarray(idx).tobytes()
            + np.ascontiguousarray(valid).tobytes()
        ).digest()[:16]
        digest = np.frombuffer(h, dtype=np.uint8).astype(np.int64)
        if not all_processes_agree(digest):
            # a safety check, not a debug assert: must survive python -O
            raise RuntimeError("epoch plan differs across processes (seed drift?)")
    sh = NamedSharding(mesh, P(None, "data"))
    return put_global(sh, np.asarray(idx)), put_global(sh, np.asarray(valid))


def replicate_on_mesh(mesh, arr):
    """Fully replicate a host array over the mesh (per-batch scalars/flags)."""
    import jax.numpy as jnp

    if mesh is None:
        return jnp.asarray(arr)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.multihost import put_global

    return put_global(NamedSharding(mesh, P()), np.asarray(arr))


def shard_carry_on_mesh(mesh, tree):
    """Apply the TP rule (parallel/mesh.py) to params/optimizer pytrees."""
    from ..parallel.mesh import shard_params

    return shard_params(mesh, tree)


def cast_compute(params, compute_dtype):
    """Mixed precision: float leaves -> compute dtype (identity when None).

    Used by both trainers so the bf16 policy cannot drift between them; the
    cast happens inside the differentiated loss, so gradients come back in
    the master dtype.
    """
    if compute_dtype is None:
        return params
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda p: p.astype(compute_dtype)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )


def outputs_f32(tree, compute_dtype):
    """Cast compute-dtype leaves of a forward's outputs back to f32 so every
    loss accumulates in full precision (identity when mixed precision is
    off)."""
    if compute_dtype is None:
        return tree
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == compute_dtype else x,
        tree,
    )


def step_lr(lr: float, step_size: Optional[int], gamma: float = 0.1):
    """StepLR schedule over epochs: lr * gamma^(epoch // step_size)."""

    def schedule(epoch: int) -> float:
        if not step_size:
            return lr
        return lr * (gamma ** (epoch // step_size))

    return schedule


def make_optimizer(weight_decay: float = 1e-4, clip_grad: Optional[float] = None):
    """Adam with torch-style coupled weight decay; lr injected per epoch.

    clip_grad: optional global-norm gradient clip.  The reference never clips
    (and ships no S-Attn training recipe at all); attention-pooled models
    suffer logit-crossing gradient spikes (26-31k norm vs healthy epoch max
    <=341), so their published-protocol runs here use ``--lr 3e-4
    --attn_logit_cap 25 --clip_grad 400`` — the clip sits above every
    healthy step and scales only the spikes (a tight 1.0 clip rescales every
    step ~70x and strangles learning to ADE ~0.82).  Mechanism analysis in
    RESULTS.md "The S-Attn instability, diagnosed".
    """
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            *([optax.clip_by_global_norm(clip_grad)] if clip_grad else []),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=1e-3)


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state

