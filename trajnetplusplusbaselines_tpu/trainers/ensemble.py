"""Seed-ensemble LSTM trainer: the whole 5-seed protocol in one process.

The reference's published numbers are mean +- std over sequential per-seed
shell runs (/root/reference/scripts/interaction/vanilla.sh:1-13).  This is
the TPU-native equivalent anticipated in SURVEY.md §2.5: members vmap over a
leading ensemble axis inside the resident-epoch scan, so every optimizer
step trains all seeds at once on one chip.  Each member keeps its own
initialization, shuffle order and augmentation draws; only the resident
scene arrays are shared.  Checkpoints are written per member under the same
``lstm_<type>_seed<k>.pkl`` names the sequential sweep would produce, so the
evaluator consumes them unchanged.

Usage:
    python -m trajnetplusplusbaselines_tpu.trainers.ensemble \
        --type directional --augment --seeds 42 10 20 30 40 \
        --path trajdata_split --data_root DATA_BLOCK
"""

import argparse
import gc
import logging
import os
import random
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import __version__ as VERSION
from ..data.load import prepare_data
from ..losses import l2_loss, prediction_loss
from ..models.lstm import LSTM, LSTMPredictor
from ..ops.pooling import make_pool
from .common import (
    ResidentDataset,
    cast_compute,
    outputs_f32,
    SceneDataset,
    enable_compilation_cache,
    log_process_record,
    make_bucket_epoch_runner,
    make_optimizer,
    set_lr,
    setup_logging,
    step_lr,
    validate_mesh_batch,
)
from .lstm import add_arguments


class EnsembleTrainer:
    def __init__(self, model, stacked_params, optimizer, lr_schedule, seeds,
                 criterion="pred", batch_size=8, obs_length=9, pred_length=12,
                 augment=True, augment_noise=False, save_every=1, val_flag=True,
                 mesh=None, compute_dtype=None):
        self.model = model
        # mixed precision (see trainers/lstm.py): bf16 forward/backward, f32
        # master params/optimizer/loss
        self.compute_dtype = compute_dtype
        self.params = stacked_params  # leaves have leading [E] axis
        self.optimizer = optimizer
        self.opt_state = jax.vmap(optimizer.init)(stacked_params)
        self.lr_schedule = lr_schedule
        self.seeds = list(seeds)
        self.criterion = criterion
        self.log = logging.getLogger(self.__class__.__name__)

        self.batch_size = batch_size
        self.obs_length = obs_length
        self.pred_length = pred_length
        self.seq_length = obs_length + pred_length
        self.augment = augment
        self.augment_noise = augment_noise
        self.save_every = save_every
        self.val_flag = val_flag

        self.rngs = [np.random.default_rng(s) for s in self.seeds]
        self.keys = jnp.stack([jax.random.PRNGKey(s + 1) for s in self.seeds])
        self._resident = {}
        self._runner_cache = {}

        # multi-chip: shard each step's scene-batch axis over 'data' exactly
        # like the sequential trainer (members stay vmapped on every device;
        # per-member grads psum over ICI).  TP is not wired for the stacked
        # [E, ...] parameter layout.
        self.mesh = mesh
        if mesh is not None:
            if mesh.shape["model"] != 1:
                raise ValueError("ensemble trainer supports --dp only")
            validate_mesh_batch(mesh, batch_size)

    # ------------------------------------------------------------- step core
    def _loss_fn(self, params, xy, mask, goals, slot, scene):
        params = cast_compute(params, self.compute_dtype)
        rel, _, _ = self.model.forward(
            params, xy[: self.obs_length], mask[: self.obs_length], goals, slot,
            prediction_truth=xy[self.obs_length : self.seq_length - 1],
            prediction_truth_mask=mask[self.obs_length : self.seq_length - 1],
        )
        rel = outputs_f32(rel, self.compute_dtype)
        targets = (
            xy[self.obs_length : self.seq_length, :, 0]
            - xy[self.obs_length - 1 : self.seq_length - 1, :, 0]
        )
        primary = rel[-self.pred_length :, :, 0]
        if self.criterion == "L2":
            return l2_loss(primary, targets, scene) * self.batch_size
        return prediction_loss(primary, targets, scene) * self.batch_size

    def _train_step_core(self):
        def step_core(carry, xy, mask, goals, slot, scene, key):
            del key
            params, opt_state = carry
            loss, grads = jax.value_and_grad(self._loss_fn)(
                params, xy, mask, goals, slot, scene
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        return step_core

    def _val_step_core(self):
        def step_core(params, xy, mask, goals, slot, scene, key):
            del key
            return params, self._loss_fn(params, xy, mask, goals, slot, scene)

        return step_core

    # ------------------------------------------------------------- epochs
    def _get_resident(self, scenes):
        # key by id but pin the dataset with a strong reference so a freed
        # object's reused address can never alias a stale cache entry
        if id(scenes) not in self._resident:
            resident = ResidentDataset(scenes)
            if self.mesh is not None:
                resident.place(self.mesh)
            self._resident[id(scenes)] = (scenes, resident)
        return self._resident[id(scenes)][1]

    def _member_plans(self, resident, shuffle):
        """Per-bucket stacked [E, nb, S] plans: one shuffle per member."""
        per_member = [
            resident.epoch_plan(self.batch_size, rng, shuffle=shuffle)
            for rng in self.rngs
        ]
        stacked = {}
        for bkey in per_member[0]:
            idx = np.stack([p[bkey][0] for p in per_member])
            valid = np.stack([p[bkey][1] for p in per_member])
            stacked[bkey] = (idx, valid)
        return stacked

    def _epoch(self, scenes, mode, carry, augment=False, augment_noise=False,
               shuffle=True):
        resident = self._get_resident(scenes)
        plan = self._member_plans(resident, shuffle)
        outs = []
        for bkey, (idx, valid) in plan.items():
            rkey = (mode, bkey, idx.shape[1])
            if rkey not in self._runner_cache:
                core = (
                    self._train_step_core() if mode == "train"
                    else self._val_step_core()
                )
                self._runner_cache[rkey] = make_bucket_epoch_runner(
                    core, augment=augment, augment_noise=augment_noise,
                    obs_length=self.obs_length, ensemble=True,
                )
            data = resident.buckets[bkey]
            split = jax.vmap(jax.random.split)(self.keys)
            self.keys, subs = split[:, 0], split[:, 1]
            idx_dev, valid_dev = jnp.asarray(idx), jnp.asarray(valid)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self.mesh, P(None, None, "data"))
                idx_dev = jax.device_put(idx_dev, sh)
                valid_dev = jax.device_put(valid_dev, sh)
            carry, out = self._runner_cache[rkey](
                carry, data["xs"], data["mask"], data["goals"],
                data["num_agents"], idx_dev, valid_dev, subs,
            )
            outs.append(out)  # [E, nb]
        return carry, outs

    def loop(self, train_scenes, val_scenes, outputs, epochs=25):
        for epoch in range(epochs):
            if epoch % self.save_every == 0:
                self.save_checkpoints(epoch, [o + f".epoch{epoch}" for o in outputs])
            self.train(train_scenes, epoch)
            if self.val_flag and val_scenes is not None:
                self.val(val_scenes, epoch)
        self.save_checkpoints(epochs, [o + f".epoch{epochs}" for o in outputs])
        self.save_checkpoints(epochs, outputs)

    def train(self, scenes, epoch):
        start = time.time()
        print("epoch", epoch)
        lr = float(self.lr_schedule(epoch))
        # the stacked opt state is sliced per member under vmap, so the
        # injected hyperparam needs a leading ensemble axis
        self.opt_state = set_lr(
            self.opt_state, jnp.full((len(self.seeds),), lr)
        )
        carry = (self.params, self.opt_state)
        carry, outs = self._epoch(
            scenes, "train", carry, augment=self.augment,
            augment_noise=self.augment_noise,
        )
        self.params, self.opt_state = carry
        losses = np.concatenate([np.asarray(o) for o in outs], axis=1)  # [E, nb]
        self.log.info({
            "type": "train-epoch",
            "epoch": epoch + 1,
            "loss": [round(float(l), 5) for l in losses.sum(axis=1) / max(len(scenes), 1)],
            "seeds": self.seeds,
            "lr": lr,
            "time": round(time.time() - start, 1),
        })

    def val(self, scenes, epoch):
        start = time.time()
        self.params, outs = self._epoch(scenes, "val", self.params, shuffle=False)
        losses = np.concatenate([np.asarray(o) for o in outs], axis=1)
        self.log.info({
            "type": "val-epoch",
            "epoch": epoch + 1,
            "loss": [round(float(l), 3) for l in losses.sum(axis=1) / max(len(scenes), 1)],
            "seeds": self.seeds,
            "time": round(time.time() - start, 1),
        })

    def save_checkpoints(self, epoch, filenames):
        # per-member state matches Trainer.save_checkpoint's dict exactly
        # (incl. the opt_state slice), so ensemble-produced .epoch<k> files
        # resume under the sequential trainer's --load_full_state
        lr = float(self.lr_schedule(max(epoch - 1, 0)))
        # predictor pickles evaluate in f32 regardless of training dtype
        import copy

        eval_model = copy.copy(self.model)
        eval_model.compute_dtype = None
        for i, filename in enumerate(filenames):
            member = jax.tree.map(lambda x: np.asarray(x[i]), self.params)
            opt_member = jax.tree.map(lambda x: np.asarray(x)[i], self.opt_state)
            state = {
                "epoch": epoch,
                "params": member,
                "opt_state_hyper": {"learning_rate": lr},
                "opt_state": opt_member,
            }
            LSTMPredictor(eval_model, member).save(state, filename)


# ---------------------------------------------------------------- auto-split
# Round-4 registry runs found two families whose 5-member vmapped ensemble
# exceeds one chip: nmmp HBM-OOMed (fixed at the root in ops/pooling/nongrid
# by the linear-decomposed message pass) and dir_social crashed the TPU
# worker outright.  Rather than shell-script babysitting, the trainer now
# splits the member axis on resource failures: 5 -> 3+2 -> ... -> 1, each
# chunk retrained in a FRESH subprocess (a crashed worker can wedge the
# parent's TPU client, so in-process retry is not enough).

_RESOURCE_MARKERS = (
    "resource_exhausted",
    "ran out of memory",
    "out of memory",
    "oom",
    "kernel fault",
    "crashed or restarted",
    "data_loss",
)


def is_resource_failure(exc: BaseException) -> bool:
    """True for OOM / TPU-worker-crash failures worth retrying split."""
    msg = f"{type(exc).__name__}: {exc}".lower()
    return any(m in msg for m in _RESOURCE_MARKERS)


def split_members(seeds):
    """Ceil-half member split preserving order: [a,b,c,d,e] -> [a,b,c],[d,e]."""
    if len(seeds) < 2:
        raise ValueError("cannot split a single member")
    half = (len(seeds) + 1) // 2
    return [list(seeds[:half]), list(seeds[half:])]


def argv_with_seeds(argv, seeds):
    """Copy of a CLI argv with any --seeds group replaced by `seeds`."""
    out, i = [], 0
    while i < len(argv):
        if argv[i] == "--seeds":
            i += 1
            while i < len(argv) and not argv[i].startswith("--"):
                i += 1
            continue
        out.append(argv[i])
        i += 1
    return out + ["--seeds"] + [str(s) for s in seeds]


def _run_chunks(argv, chunks, log):
    for chunk in chunks:
        chunk_argv = argv_with_seeds(argv, chunk)
        log.warning({"type": "ensemble-split-chunk", "seeds": chunk})
        rc = subprocess.call(
            [sys.executable, "-m", "trajnetplusplusbaselines_tpu.trainers.ensemble"]
            + chunk_argv
        )
        if rc != 0:
            raise SystemExit(
                f"ensemble auto-split chunk {chunk} failed with rc={rc}"
            )


def main(epochs=25, argv=None):
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    parser = argparse.ArgumentParser()
    add_arguments(parser, epochs)
    parser.add_argument("--seeds", type=int, nargs="+",
                        default=[42, 10, 20, 30, 40])
    parser.add_argument("--suffix", default="",
                        help="appended to each member's seed<k> output name "
                             "(variant runs must not overwrite the protocol "
                             "checkpoints)")
    parser.add_argument("--no_autosplit", action="store_true",
                        help="fail outright on OOM/worker-crash instead of "
                             "retraining member chunks in subprocesses")
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    random.seed(args.seeds[0])
    np.random.seed(args.seeds[0])
    enable_compilation_cache()

    if not os.path.exists(f"OUTPUT_BLOCK/{args.path}"):
        os.makedirs(f"OUTPUT_BLOCK/{args.path}")
    prefix = "lstm_goals" if args.goals else "lstm"
    outputs = [
        f"OUTPUT_BLOCK/{args.path}/{prefix}_{args.type}_seed{s}{args.suffix}.pkl"
        for s in args.seeds
    ]

    setup_logging(outputs[0].replace(".pkl", "_ensemble.pkl"))
    log_process_record(args, VERSION)

    data_path = os.path.join(args.data_root, args.path)
    train_scenes, train_goals, _ = prepare_data(
        data_path, subset="/train/", sample=args.sample, goals=args.goals
    )
    val_scenes, val_goals, val_flag = prepare_data(
        data_path, subset="/val/", sample=args.sample, goals=args.goals
    )

    mesh = None
    if args.tp > 1:
        raise SystemExit("ensemble trainer supports --dp only (members are "
                         "vmapped over the stacked [E, ...] param layout, "
                         "which the TP rule does not shard)")
    if args.dp > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=args.dp, dp=args.dp, tp=1)

    def _train_members():
        pool = make_pool(args.type, args)
        model = LSTM(
            pool=pool,
            embedding_dim=args.coordinate_embedding_dim,
            hidden_dim=args.hidden_dim,
            goal_flag=args.goals,
            goal_dim=args.goal_dim,
        )
        model.remat = args.remat
        compute_dtype = jnp.bfloat16 if args.bf16 else None
        if compute_dtype is not None:
            model.with_dtype(compute_dtype)
        stacked = jax.vmap(model.init_params)(
            jnp.stack([jax.random.PRNGKey(s) for s in args.seeds])
        )

        optimizer = make_optimizer(weight_decay=1e-4, clip_grad=args.clip_grad)
        lr_schedule = step_lr(args.lr, args.step_size)

        trainer = EnsembleTrainer(
            model, stacked, optimizer, lr_schedule, args.seeds,
            criterion=args.loss, batch_size=args.batch_size,
            obs_length=args.obs_length, pred_length=args.pred_length,
            augment=args.augment, augment_noise=args.augment_noise,
            save_every=args.save_every, val_flag=val_flag,
            compute_dtype=compute_dtype, mesh=mesh,
        )

        train_ds = SceneDataset(train_scenes, train_goals, args.obs_length,
                                args.normalize_scene)
        val_ds = (
            SceneDataset(val_scenes, val_goals, args.obs_length, args.normalize_scene)
            if val_scenes is not None else None
        )
        trainer.loop(train_ds, val_ds, outputs, epochs=args.epochs)

    log = logging.getLogger("EnsembleTrainer")
    try:
        _train_members()
    except Exception as exc:  # pylint: disable=broad-except
        if args.no_autosplit or len(args.seeds) < 2 or not is_resource_failure(exc):
            raise
        chunks = split_members(args.seeds)
        log.warning({
            "type": "ensemble-autosplit",
            "reason": repr(exc)[:500],
            "seeds": args.seeds,
            "chunks": chunks,
        })
        # drop the failed attempt's frames (the traceback pins the trainer
        # and its HBM-resident buffers) before the chunk subprocesses start
        exc = None  # noqa: F841
        gc.collect()
        _run_chunks(argv, chunks, log)


if __name__ == "__main__":
    main()
