"""Command-line VAE trainer.

Behavioural mirror of /root/reference/trajnetbaselines/vae/trainer.py:29-549:
reconstruction loss averaged over k decoded modes plus alpha_kld-weighted KL
divergence of the posterior against the prior (standard normal under the
DESIRE-style default), one jitted step per batch bucket.
"""

import argparse
import functools
import logging
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import __version__ as VERSION
from ..data.load import prepare_data
from ..losses import kld_loss, l2_loss, prediction_loss
from ..models.vae import VAE, VAEPredictor
from ..ops.pooling import make_pool
from ..utils import checkpoint as ckpt
from .common import (
    outputs_f32,
    cast_compute,
    ResidentDataset,
    SceneDataset,
    log_process_record,
    make_bucket_epoch_runner,
    make_optimizer,
    place_plan_on_mesh,
    set_lr,
    setup_logging,
    shard_carry_on_mesh,
    step_lr,
    validate_mesh_batch,
)
from .lstm import add_arguments


class Trainer:
    def __init__(self, model: VAE, params, optimizer, lr_schedule, criterion="pred",
                 batch_size=8, obs_length=9, pred_length=12, augment=True,
                 normalize_scene=False, save_every=1, start_length=0,
                 obs_dropout=False, augment_noise=False, alpha_kld=1.0,
                 val_flag=True, seed=42, compute_dtype=None, orbax=False,
                 mesh=None):
        self.model = model
        # mixed precision (trainers/common.py cast_compute/outputs_f32)
        self.compute_dtype = compute_dtype
        self.orbax = orbax
        self.params = params
        self.optimizer = optimizer
        self.opt_state = optimizer.init(params)
        self.lr_schedule = lr_schedule
        self.criterion = criterion
        self.log = logging.getLogger(self.__class__.__name__)

        self.batch_size = batch_size
        self.obs_length = obs_length
        self.pred_length = pred_length
        self.seq_length = obs_length + pred_length
        self.augment = augment
        self.augment_noise = augment_noise
        self.normalize_scene = normalize_scene
        self.save_every = save_every
        self.start_length = start_length
        self.obs_dropout = obs_dropout
        self.alpha_kld = alpha_kld
        self.val_flag = val_flag

        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self._step_cache = {}
        self._resident = {}
        self._runner_cache = {}

        # multi-chip: same (data, model) mesh semantics as the LSTM trainer
        # (trainers/lstm.py) — scene-batch axis over 'data', TP over 'model'.
        self.mesh = mesh
        self._mesh_placed = False
        validate_mesh_batch(mesh, batch_size)
        if mesh is not None and obs_dropout:
            raise ValueError(
                "obs_dropout uses the chunked host path, which is "
                "single-device; it cannot be combined with a mesh"
            )

    def _place_carry(self):
        """One-time mesh placement of params/opt_state (TP rule + replication)."""
        if self.mesh is None or self._mesh_placed:
            return
        self.params = shard_carry_on_mesh(self.mesh, self.params)
        self.opt_state = shard_carry_on_mesh(self.mesh, self.opt_state)
        self._mesh_placed = True

    def _losses(self, params, xy, mask, goals, slot_mask, scene_mask, key, training,
                start_length=None):
        start_length = self.start_length if start_length is None else start_length
        observed = xy[start_length : self.obs_length]
        observed_mask = mask[start_length : self.obs_length]
        truth = xy[self.obs_length : self.seq_length - 1]
        truth_mask = mask[self.obs_length : self.seq_length - 1]
        rel_list, _, _, z_distr_xy, z_distr_x = outputs_f32(self.model.forward(
            cast_compute(params, self.compute_dtype), observed, observed_mask,
            goals, slot_mask,
            prediction_truth=truth, prediction_truth_mask=truth_mask,
            key=key, training=training,
        ), self.compute_dtype)

        targets = (
            xy[self.obs_length : self.seq_length, :, 0]
            - xy[self.obs_length - 1 : self.seq_length - 1, :, 0]
        )
        reconstr = 0.0
        for rel in rel_list:
            primary_rel = rel[-self.pred_length :, :, 0]
            if self.criterion == "L2":
                reconstr += l2_loss(primary_rel, targets, scene_mask) * self.batch_size
            else:
                reconstr += prediction_loss(primary_rel, targets, scene_mask) * self.batch_size
        reconstr = reconstr / self.model.num_modes

        kld = 0.0
        if z_distr_xy is not None:
            primary_xy = z_distr_xy[:, 0]  # [S, 2*latent] primaries only
            primary_x = z_distr_x[:, 0] if z_distr_x is not None else None
            kld = kld_loss(primary_xy, primary_x) * self.batch_size
        return reconstr, kld

    def _make_train_step(self, shape_key):
        start_length = shape_key[2]

        def loss_fn(params, xy, mask, goals, slot_mask, scene_mask, key):
            reconstr, kld = self._losses(
                params, xy, mask, goals, slot_mask, scene_mask, key, True,
                start_length=start_length,
            )
            return reconstr + self.alpha_kld * kld, reconstr

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, xy, mask, goals, slot_mask, scene_mask, key):
            (loss, reconstr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, xy, mask, goals, slot_mask, scene_mask, key
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, reconstr

        return step

    # -------------------------------------------------- resident fast path
    def _get_resident(self, scenes):
        # key by id but pin the dataset with a strong reference so a freed
        # object's reused address can never alias a stale cache entry
        if id(scenes) not in self._resident:
            resident = ResidentDataset(scenes)
            if self.mesh is not None:
                resident.place(self.mesh)
            self._resident[id(scenes)] = (scenes, resident)
        return self._resident[id(scenes)][1]

    def _resident_epoch(self, scenes, mode, carry, augment=False,
                        augment_noise=False, shuffle=True):
        resident = self._get_resident(scenes)
        plan = resident.epoch_plan(self.batch_size, self.rng, shuffle=shuffle)
        outs = []
        for bkey, (idx, valid) in plan.items():
            rkey = (mode, bkey, idx.shape[0])
            if rkey not in self._runner_cache:
                core = (
                    self._train_step_core() if mode == "train" else self._val_step_core()
                )
                self._runner_cache[rkey] = make_bucket_epoch_runner(
                    core, augment=augment, augment_noise=augment_noise,
                    obs_length=self.obs_length,
                )
            data = resident.buckets[bkey]
            self.key, sub = jax.random.split(self.key)
            idx_dev, valid_dev = place_plan_on_mesh(self.mesh, idx, valid)
            carry, out = self._runner_cache[rkey](
                carry, data["xs"], data["mask"], data["goals"],
                data["num_agents"], idx_dev, valid_dev, sub,
            )
            outs.append(out)
        return carry, outs

    def _train_step_core(self):
        def loss_fn(params, xy, mask, goals, slot_mask, scene_mask, key):
            reconstr, kld = self._losses(
                params, xy, mask, goals, slot_mask, scene_mask, key, True,
                start_length=self.start_length,
            )
            return reconstr + self.alpha_kld * kld, reconstr

        def step_core(carry, xy, mask, goals, slot, scene, key):
            params, opt_state = carry
            (_, reconstr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, xy, mask, goals, slot, scene, key
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), reconstr

        return step_core

    def _val_step_core(self):
        def step_core(params, xy, mask, goals, slot, scene, key):
            reconstr, kld = self._losses(
                params, xy, mask, goals, slot, scene, key, True,
                start_length=0 if self.obs_dropout else self.start_length,
            )
            return params, reconstr + self.alpha_kld * kld

        return step_core

    # ----------------------------------------------------------------- loops
    def loop(self, train_scenes, val_scenes, out, epochs=25, start_epoch=0):
        for epoch in range(start_epoch, epochs):
            if epoch % self.save_every == 0:
                self.save_checkpoint(epoch, out + f".epoch{epoch}")
            self.train(train_scenes, epoch)
            if self.val_flag and val_scenes is not None:
                self.val(val_scenes, epoch)
        self.save_checkpoint(epochs, out + f".epoch{epochs}")
        self.save_checkpoint(epochs, out)

    def save_checkpoint(self, epoch, filename):
        state = {"epoch": epoch, "params": self.params, "opt_state": self.opt_state}
        # predictor pickles evaluate in f32 regardless of training dtype
        import copy

        model = copy.copy(self.model)
        model.compute_dtype = None
        VAEPredictor(model, self.params).save(state, filename)
        if self.orbax:
            ckpt.save_orbax(state, filename + ".orbax")

    def train(self, scenes: SceneDataset, epoch: int):
        start_time = time.time()
        print("epoch", epoch)
        self.opt_state = set_lr(self.opt_state, self.lr_schedule(epoch))

        if not self.obs_dropout:
            # resident fast path: whole epoch in one dispatch per bucket
            self._place_carry()
            carry = (self.params, self.opt_state)
            carry, loss_parts = self._resident_epoch(
                scenes, "train", carry,
                augment=self.augment, augment_noise=self.augment_noise,
            )
            self.params, self.opt_state = carry
            losses = np.concatenate([np.asarray(p) for p in loss_parts])
            n_batches = len(losses)
            per_batch = (time.time() - start_time) / max(n_batches, 1)
            for b in range(10, n_batches + 1, 10):
                self.log.info({
                    "type": "train",
                    "epoch": epoch, "batch": b * self.batch_size,
                    "n_batches": len(scenes),
                    "time": round(per_batch, 4),
                    "lr": float(self.lr_schedule(epoch)),
                    "loss": round(float(losses[b - 1]), 3),
                })
            self.log.info({
                "type": "train-epoch",
                "epoch": epoch + 1,
                "loss": round(float(losses.sum()) / max(len(scenes), 1), 5),
                "time": round(time.time() - start_time, 1),
            })
            return

        epoch_loss = 0.0
        scene_i = 0
        last_loss = total_time = 0.0
        start_length = self.start_length
        for packed in scenes.epoch_batches(
            self.batch_size, self.rng, self.augment, self.augment_noise
        ):
            scene_start = time.time()
            if self.obs_dropout:
                start_length = int(self.rng.integers(0, self.obs_length - 1))
            slot_mask = np.arange(packed.max_agents)[None] < packed.num_agents[:, None]
            scene_mask = packed.num_agents > 0
            self.key, sub = jax.random.split(self.key)

            shape_key = (packed.num_scenes, packed.max_agents, start_length)
            if shape_key not in self._step_cache:
                self._step_cache[shape_key] = self._make_train_step(shape_key)
            step = self._step_cache[shape_key]

            self.params, self.opt_state, loss = step(
                self.params, self.opt_state,
                jnp.asarray(packed.xy), jnp.asarray(packed.mask),
                jnp.asarray(packed.goals), jnp.asarray(slot_mask),
                jnp.asarray(scene_mask), sub,
            )
            last_loss = float(loss)
            epoch_loss += last_loss
            total_time = time.time() - scene_start
            scene_i += packed.num_scenes

            if scene_i % (10 * self.batch_size) == 0:
                self.log.info({
                    "type": "train",
                    "epoch": epoch, "batch": scene_i, "n_batches": len(scenes),
                    "time": round(total_time, 3),
                    "lr": float(self.lr_schedule(epoch)),
                    "loss": round(last_loss, 3),
                })

        self.log.info({
            "type": "train-epoch",
            "epoch": epoch + 1,
            "loss": round(epoch_loss / max(len(scenes), 1), 5),
            "time": round(time.time() - start_time, 1),
        })

    def val(self, scenes: SceneDataset, epoch: int):
        eval_start = time.time()

        self._place_carry()
        self.params, parts = self._resident_epoch(
            scenes, "val", self.params, shuffle=False
        )
        val_loss = float(sum(jnp.sum(p) for p in parts))

        self.log.info({
            "type": "val-epoch",
            "epoch": epoch + 1,
            "loss": round(val_loss / max(len(scenes), 1), 3),
            "time": round(time.time() - eval_start, 1),
        })


def main(epochs=25, argv=None):
    parser = argparse.ArgumentParser()
    add_arguments(parser, epochs)
    vae_group = parser.add_argument_group("vae")
    vae_group.add_argument("--alpha_kld", type=float, default=1.0)
    vae_group.add_argument("--k", type=int, default=1, help="number of decoded modes")
    vae_group.add_argument("--vae_latent_dim", type=int, default=128,
                           help="latent dimension of the VAE bottleneck")
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    random.seed(args.seed)
    np.random.seed(args.seed)
    from .common import enable_compilation_cache
    enable_compilation_cache()

    if not os.path.exists(f"OUTPUT_BLOCK/{args.path}"):
        os.makedirs(f"OUTPUT_BLOCK/{args.path}")
    prefix = "vae_goals" if args.goals else "vae"
    args.output = f"OUTPUT_BLOCK/{args.path}/{prefix}_{args.type}_{args.output}.pkl"

    setup_logging(args.output, append=bool(args.load_full_state))
    log_process_record(args, VERSION)

    args.load_state_strict = True
    if args.nonstrict_load_state:
        args.load_state = args.nonstrict_load_state
        args.load_state_strict = False
    if args.load_full_state:
        args.load_state = args.load_full_state

    data_path = os.path.join(args.data_root, args.path)
    train_scenes, train_goals, _ = prepare_data(
        data_path, subset="/train/", sample=args.sample, goals=args.goals
    )
    val_scenes, val_goals, val_flag = prepare_data(
        data_path, subset="/val/", sample=args.sample, goals=args.goals
    )

    pool = make_pool(args.type, args)
    model = VAE(
        embedding_dim=args.coordinate_embedding_dim, hidden_dim=args.hidden_dim,
        pool=pool, goal_flag=args.goals, goal_dim=args.goal_dim,
        num_modes=args.k, latent_dim=args.vae_latent_dim,
    )
    model.remat = args.remat
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    if compute_dtype is not None:
        model.with_dtype(compute_dtype)
    params = model.init_params(jax.random.PRNGKey(args.seed))

    optimizer = make_optimizer(weight_decay=1e-4, clip_grad=args.clip_grad)
    lr_schedule = step_lr(args.lr, args.step_size)

    start_epoch = 0
    if args.load_state:
        print("Loading Model Dict")
        state = ckpt.load_state(args.load_state)
        if args.load_state_strict:
            params = jax.tree.map(jnp.asarray, state["params"])
        else:
            params, skipped = ckpt.merge_params_nonstrict(params, state["params"])
            if skipped:
                print("nonstrict load skipped:", skipped)

    mesh = None
    if args.dp * args.tp > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=args.dp * args.tp, dp=args.dp, tp=args.tp)
        # obs_dropout-vs-mesh rejection lives in Trainer.__init__ so direct
        # API users hit it too (advisor r4).

    trainer = Trainer(
        model, params, optimizer, lr_schedule, criterion=args.loss,
        batch_size=args.batch_size, obs_length=args.obs_length,
        pred_length=args.pred_length, augment=args.augment,
        normalize_scene=args.normalize_scene, save_every=args.save_every,
        start_length=args.start_length, obs_dropout=args.obs_dropout,
        augment_noise=args.augment_noise, alpha_kld=args.alpha_kld,
        val_flag=val_flag, seed=args.seed, compute_dtype=compute_dtype,
        orbax=args.orbax, mesh=mesh,
    )

    if args.load_full_state:
        print("Loading Optimizer Dict")
        template = {
            "epoch": 0,
            "params": jax.device_get(trainer.params),
            "opt_state": jax.device_get(trainer.opt_state),
        }
        state = ckpt.load_full_state(args.load_full_state, template)
        trainer.opt_state = ckpt.restore_opt_state(
            state["opt_state"], trainer.opt_state
        )
        start_epoch = state["epoch"]

    train_ds = SceneDataset(train_scenes, train_goals, args.obs_length, args.normalize_scene)
    val_ds = (
        SceneDataset(val_scenes, val_goals, args.obs_length, args.normalize_scene)
        if val_scenes is not None else None
    )
    trainer.loop(train_ds, val_ds, args.output, epochs=args.epochs, start_epoch=start_epoch)


if __name__ == "__main__":
    main()
