"""Command-line SGAN trainer.

Behavioural mirror of /root/reference/trajnetbaselines/sgan/trainer.py:32-643:
per-batch round-robin of g_steps generator updates then d_steps discriminator
updates, variety loss (min over k per scene, summed) plus the adversarial
terms, twin Adam optimizers and StepLR schedules.  Both step types are single
jitted device programs.
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
from ..losses import gan_d_loss, gan_g_loss, l2_loss, prediction_loss
from ..models.sgan import SGAN, LSTMDiscriminator, LSTMGenerator, SGANPredictor
from ..ops.pooling import make_pool
from ..utils import checkpoint as ckpt
from .common import (
    outputs_f32,
    cast_compute,
    ResidentDataset,
    SceneDataset,
    enable_compilation_cache,
    log_process_record,
    make_bucket_epoch_runner,
    make_optimizer,
    place_plan_on_mesh,
    replicate_on_mesh,
    set_lr,
    setup_logging,
    shard_carry_on_mesh,
    step_lr,
    validate_mesh_batch,
)
from .lstm import add_arguments


class Trainer:
    def __init__(self, model: SGAN, params, g_optimizer, d_optimizer, g_schedule,
                 d_schedule, criterion="L2", batch_size=8, obs_length=9,
                 pred_length=12, augment=True, normalize_scene=False, save_every=1,
                 start_length=0, obs_dropout=False, augment_noise=False,
                 val_flag=True, seed=42, compute_dtype=None, orbax=False,
                 mesh=None):
        self.model = model
        # mixed precision (trainers/common.py cast_compute/outputs_f32):
        # bf16 forward/backward for BOTH networks, f32 masters and losses
        self.compute_dtype = compute_dtype
        self.orbax = orbax
        self.params = params
        self.g_optimizer = g_optimizer
        self.d_optimizer = d_optimizer
        self.g_opt_state = g_optimizer.init(params["generator"])
        self.d_opt_state = d_optimizer.init(params["discriminator"])
        self.g_schedule = g_schedule
        self.d_schedule = d_schedule
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
        self.val_flag = val_flag

        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self._step_cache = {}
        self._resident = {}
        self._runner_cache = {}

        # multi-chip: same (data, model) mesh semantics as the LSTM trainer
        # (trainers/lstm.py) — per-batch scene axis shards over 'data' with
        # psum gradient reduction, wide weight matrices optionally TP-shard
        # over 'model'; both players' params/optimizers place identically so
        # the fused g/d lax.cond step stays a single SPMD program.
        self.mesh = mesh
        self._mesh_placed = False
        validate_mesh_batch(mesh, batch_size)
        if mesh is not None and obs_dropout:
            raise ValueError(
                "obs_dropout uses the chunked host path, which is "
                "single-device; it cannot be combined with a mesh"
            )

    def _place_carry(self):
        """One-time mesh placement of both players' params + optimizers."""
        if self.mesh is None or self._mesh_placed:
            return
        self.params = shard_carry_on_mesh(self.mesh, self.params)
        self.g_opt_state = shard_carry_on_mesh(self.mesh, self.g_opt_state)
        self.d_opt_state = shard_carry_on_mesh(self.mesh, self.d_opt_state)
        self._mesh_placed = True

    # ---------------------------------------------------------------- pieces
    def _scene_criterion(self, rel, xy, scene_mask):
        """Per-scene primary loss [S] (keep_batch_dim)."""
        targets = (
            xy[self.obs_length : self.seq_length, :, 0]
            - xy[self.obs_length - 1 : self.seq_length - 1, :, 0]
        )
        primary_rel = rel[-self.pred_length :, :, 0]
        if self.criterion == "L2":
            return l2_loss(primary_rel, targets, scene_mask, keep_batch_dim=True)
        return prediction_loss(primary_rel, targets, scene_mask, keep_batch_dim=True)

    def variety_loss(self, rel_list, xy, scene_mask):
        per_sample = jnp.stack(
            [self._scene_criterion(rel, xy, scene_mask) for rel in rel_list]
        )  # [k, S]
        return jnp.sum(jnp.min(per_sample, axis=0))

    def _forward(self, params, xy, mask, goals, slot_mask, step_type, key):
        observed = xy[self.start_length : self.obs_length]
        observed_mask = mask[self.start_length : self.obs_length]
        truth = xy[self.obs_length :]
        truth_mask = mask[self.obs_length :]
        return outputs_f32(self.model.forward(
            cast_compute(params, self.compute_dtype), observed, observed_mask,
            goals, slot_mask,
            prediction_truth=truth, prediction_truth_mask=truth_mask,
            step_type=step_type, pred_length=self.pred_length, key=key,
        ), self.compute_dtype)

    def _make_step(self, step_type, shape_key):
        if step_type == "g":
            def loss_fn(g_params, d_params, xy, mask, goals, slot_mask, scene_mask, key):
                params = {"generator": g_params, "discriminator": d_params}
                key, gkey = jax.random.split(key)
                rel_list, _, _, _, scores_fake = self._forward(
                    params, xy, mask, goals, slot_mask, "g", key
                )
                loss = self.variety_loss(rel_list, xy, scene_mask)
                if self.model.d_steps:
                    loss = loss + gan_g_loss(scores_fake, gkey)
                return loss

            @jax.jit
            def step(g_params, d_params, g_opt_state, xy, mask, goals, slot_mask,
                     scene_mask, key):
                loss, grads = jax.value_and_grad(loss_fn)(
                    g_params, d_params, xy, mask, goals, slot_mask, scene_mask, key
                )
                updates, g_opt_state = self.g_optimizer.update(
                    grads, g_opt_state, g_params
                )
                g_params = jax.tree.map(lambda p, u: p + u, g_params, updates)
                return g_params, g_opt_state, loss

            return step

        def loss_fn(d_params, g_params, xy, mask, goals, slot_mask, scene_mask, key):
            params = {"generator": g_params, "discriminator": d_params}
            key, dkey = jax.random.split(key)
            _, _, _, scores_real, scores_fake = self._forward(
                params, xy, mask, goals, slot_mask, "d", key
            )
            return gan_d_loss(scores_real, scores_fake, dkey)

        @jax.jit
        def step(d_params, g_params, d_opt_state, xy, mask, goals, slot_mask,
                 scene_mask, key):
            loss, grads = jax.value_and_grad(loss_fn)(
                d_params, g_params, xy, mask, goals, slot_mask, scene_mask, key
            )
            updates, d_opt_state = self.d_optimizer.update(grads, d_opt_state, d_params)
            d_params = jax.tree.map(lambda p, u: p + u, d_params, updates)
            return d_params, d_opt_state, loss

        return step

    def _get_step(self, step_type, packed):
        key = (step_type, packed.num_scenes, packed.max_agents)
        if key not in self._step_cache:
            self._step_cache[key] = self._make_step(step_type, key)
        return self._step_cache[key]

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

    def _train_step_core(self):
        """Fused g/d step: a per-batch flag selects which player updates.

        Mirrors the reference's per-batch g_steps/d_steps round-robin
        (/root/reference/trajnetbaselines/sgan/trainer.py:144-170) inside the
        epoch scan via lax.cond; with d_steps == 0 (variety-only) the
        discriminator branch is dropped statically.
        """

        def g_loss_fn(g_params, d_params, xy, mask, goals, slot, scene, key):
            params = {"generator": g_params, "discriminator": d_params}
            key, gkey = jax.random.split(key)
            rel_list, _, _, _, scores_fake = self._forward(
                params, xy, mask, goals, slot, "g", key
            )
            loss = self.variety_loss(rel_list, xy, scene)
            if self.model.d_steps:
                loss = loss + gan_g_loss(scores_fake, gkey)
            return loss

        def d_loss_fn(d_params, g_params, xy, mask, goals, slot, scene, key):
            params = {"generator": g_params, "discriminator": d_params}
            key, dkey = jax.random.split(key)
            _, _, _, scores_real, scores_fake = self._forward(
                params, xy, mask, goals, slot, "d", key
            )
            return gan_d_loss(scores_real, scores_fake, dkey)

        def g_update(operand):
            (g_params, d_params, g_opt, d_opt), batch = operand
            loss, grads = jax.value_and_grad(g_loss_fn)(g_params, d_params, *batch)
            updates, g_opt = self.g_optimizer.update(grads, g_opt, g_params)
            g_params = jax.tree.map(lambda p, u: p + u, g_params, updates)
            return (g_params, d_params, g_opt, d_opt), loss

        def d_update(operand):
            (g_params, d_params, g_opt, d_opt), batch = operand
            loss, grads = jax.value_and_grad(d_loss_fn)(d_params, g_params, *batch)
            updates, d_opt = self.d_optimizer.update(grads, d_opt, d_params)
            d_params = jax.tree.map(lambda p, u: p + u, d_params, updates)
            return (g_params, d_params, g_opt, d_opt), loss

        def step_core(carry, xy, mask, goals, slot, scene, key, is_g):
            operand = (carry, (xy, mask, goals, slot, scene, key))
            if self.model.d_steps == 0:
                return g_update(operand)
            return jax.lax.cond(is_g, g_update, d_update, operand)

        return step_core

    def _val_step_core(self):
        def step_core(params, xy, mask, goals, slot, scene, key):
            rel_list, _, _, _, _ = outputs_f32(self.model.forward(
                cast_compute(params, self.compute_dtype),
                xy[self.start_length : self.obs_length],
                mask[self.start_length : self.obs_length],
                goals, slot, n_predict=self.pred_length,
                pred_length=self.pred_length, key=key,
            ), self.compute_dtype)
            return params, self.variety_loss(rel_list, xy, scene)

        return step_core

    def _step_flags(self, n_batches: int) -> np.ndarray:
        """Per-batch g(1)/d(0) flags: g_steps then d_steps, repeating."""
        pattern = [1] * self.model.g_steps + [0] * self.model.d_steps
        reps = -(-n_batches // max(len(pattern), 1)) if pattern else n_batches
        return np.asarray((pattern * max(reps, 1))[:n_batches], dtype=np.int32)

    def _resident_epoch(self, scenes, mode, carry, augment=False,
                        augment_noise=False, shuffle=True):
        resident = self._get_resident(scenes)
        plan = resident.epoch_plan(self.batch_size, self.rng, shuffle=shuffle)
        total = sum(idx.shape[0] for idx, _ in plan.values())
        flags = self._step_flags(total)
        offset = 0
        outs = []
        for bkey, (idx, valid) in plan.items():
            nb = idx.shape[0]
            rkey = (mode, bkey, nb)
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
            extras = (
                (replicate_on_mesh(self.mesh, flags[offset : offset + nb]),)
                if mode == "train" else ()
            )
            offset += nb
            idx_dev, valid_dev = place_plan_on_mesh(self.mesh, idx, valid)
            carry, out = self._runner_cache[rkey](
                carry, data["xs"], data["mask"], data["goals"],
                data["num_agents"], idx_dev, valid_dev, sub,
                *extras,
            )
            outs.append(out)
        return carry, outs

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
        state = {
            "epoch": epoch,
            "params": self.params,
            "g_opt_state": self.g_opt_state,
            "d_opt_state": self.d_opt_state,
        }
        # predictor pickles evaluate in f32 regardless of training dtype
        import copy

        model = copy.copy(self.model)
        model.generator = copy.copy(model.generator)
        model.discriminator = copy.copy(model.discriminator)
        model.generator.compute_dtype = None
        model.discriminator.compute_dtype = None
        SGANPredictor(model, self.params).save(state, filename)
        if self.orbax:
            ckpt.save_orbax(state, filename + ".orbax")

    def train(self, scenes: SceneDataset, epoch: int):
        start_time = time.time()
        print("epoch", epoch)
        self.g_opt_state = set_lr(self.g_opt_state, self.g_schedule(epoch))
        self.d_opt_state = set_lr(self.d_opt_state, self.d_schedule(epoch))

        if not self.obs_dropout:
            # resident fast path: whole epoch in one dispatch per bucket
            self._place_carry()
            carry = (
                self.params["generator"], self.params["discriminator"],
                self.g_opt_state, self.d_opt_state,
            )
            carry, loss_parts = self._resident_epoch(
                scenes, "train", carry,
                augment=self.augment, augment_noise=self.augment_noise,
            )
            g_params, d_params, self.g_opt_state, self.d_opt_state = carry
            self.params = {"generator": g_params, "discriminator": d_params}
            losses = np.concatenate([np.asarray(p) for p in loss_parts])
            n_batches = len(losses)
            per_batch = (time.time() - start_time) / max(n_batches, 1)
            for b in range(10, n_batches + 1, 10):
                self.log.info({
                    "type": "train",
                    "epoch": epoch, "batch": b * self.batch_size,
                    "n_batches": len(scenes),
                    "time": round(per_batch, 4),
                    "lr": float(self.g_schedule(epoch)),
                    "loss": round(float(losses[b - 1]), 3),
                })
            self.log.info({
                "type": "train-epoch",
                "epoch": epoch + 1,
                "loss": round(float(losses.sum()) / max(len(scenes), 1), 5),
                "time": round(time.time() - start_time, 1),
            })
            return

        g_steps_left, d_steps_left = self.model.g_steps, self.model.d_steps
        epoch_loss = 0.0
        scene_i = 0
        last_loss = total_time = 0.0
        for packed in scenes.epoch_batches(
            self.batch_size, self.rng, self.augment, self.augment_noise
        ):
            scene_start = time.time()
            slot_mask = np.arange(packed.max_agents)[None] < packed.num_agents[:, None]
            scene_mask = packed.num_agents > 0
            self.key, sub = jax.random.split(self.key)
            batch = (
                jnp.asarray(packed.xy), jnp.asarray(packed.mask),
                jnp.asarray(packed.goals), jnp.asarray(slot_mask),
                jnp.asarray(scene_mask), sub,
            )

            if g_steps_left > 0:
                g_steps_left -= 1
                step = self._get_step("g", packed)
                self.params["generator"], self.g_opt_state, loss = step(
                    self.params["generator"], self.params["discriminator"],
                    self.g_opt_state, *batch,
                )
            elif d_steps_left > 0:
                d_steps_left -= 1
                step = self._get_step("d", packed)
                self.params["discriminator"], self.d_opt_state, loss = step(
                    self.params["discriminator"], self.params["generator"],
                    self.d_opt_state, *batch,
                )
            if d_steps_left == 0 and g_steps_left == 0:
                g_steps_left, d_steps_left = self.model.g_steps, self.model.d_steps

            last_loss = float(loss)
            epoch_loss += last_loss
            total_time = time.time() - scene_start
            scene_i += packed.num_scenes

            if scene_i % (10 * self.batch_size) == 0:
                self.log.info({
                    "type": "train",
                    "epoch": epoch, "batch": scene_i, "n_batches": len(scenes),
                    "time": round(total_time, 3),
                    "lr": float(self.g_schedule(epoch)),
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
        test_loss = float(sum(jnp.sum(p) for p in parts))

        self.log.info({
            "type": "val-epoch",
            "epoch": epoch + 1,
            "loss": 0.0,
            "test_loss": round(test_loss / max(len(scenes), 1), 3),
            "time": round(time.time() - eval_start, 1),
        })


def main(epochs=25, argv=None):
    parser = argparse.ArgumentParser()
    add_arguments(parser, epochs)
    # GAN-specific flags (/root/reference/trajnetbaselines/sgan/trainer.py:492-512)
    gan = parser.add_argument_group("gan")
    gan.add_argument("--k", default=1, type=int, help="variety-loss samples")
    gan.add_argument("--noise_dim", default=16, type=int)
    gan.add_argument("--no_noise", action="store_true")
    gan.add_argument("--noise_type", default="gaussian", choices=("gaussian", "uniform"))
    gan.add_argument("--g_steps", default=1, type=int)
    gan.add_argument("--d_steps", default=1, type=int)
    gan.add_argument("--g_step_size", default=10, type=int)
    gan.add_argument("--d_step_size", default=10, type=int)
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    random.seed(args.seed)
    np.random.seed(args.seed)
    enable_compilation_cache()

    if not os.path.exists(f"OUTPUT_BLOCK/{args.path}"):
        os.makedirs(f"OUTPUT_BLOCK/{args.path}")
    prefix = "sgan_goals" if args.goals else "sgan"
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
    generator = LSTMGenerator(
        embedding_dim=args.coordinate_embedding_dim, hidden_dim=args.hidden_dim,
        pool=pool, goal_flag=args.goals, goal_dim=args.goal_dim,
        noise_dim=args.noise_dim, no_noise=args.no_noise, noise_type=args.noise_type,
    )
    # the discriminator carries its own (identically-configured) pool
    d_pool = make_pool(args.type, args)
    discriminator = LSTMDiscriminator(
        embedding_dim=args.coordinate_embedding_dim, hidden_dim=args.hidden_dim,
        pool=d_pool, goal_flag=args.goals, goal_dim=args.goal_dim,
    )
    model = SGAN(generator, discriminator, k=args.k,
                 d_steps=args.d_steps, g_steps=args.g_steps)
    generator.remat = discriminator.remat = args.remat
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    if compute_dtype is not None:
        model.with_dtype(compute_dtype)
    params = model.init_params(jax.random.PRNGKey(args.seed))

    g_optimizer = make_optimizer(weight_decay=1e-4, clip_grad=args.clip_grad)
    d_optimizer = make_optimizer(weight_decay=1e-4, clip_grad=args.clip_grad)
    g_schedule = step_lr(args.lr, args.g_step_size)
    d_schedule = step_lr(args.lr, args.d_step_size)

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
        model, params, g_optimizer, d_optimizer, g_schedule, d_schedule,
        criterion=args.loss, batch_size=args.batch_size, obs_length=args.obs_length,
        pred_length=args.pred_length, augment=args.augment,
        normalize_scene=args.normalize_scene, save_every=args.save_every,
        start_length=args.start_length, obs_dropout=args.obs_dropout,
        augment_noise=args.augment_noise, val_flag=val_flag, seed=args.seed,
        compute_dtype=compute_dtype, orbax=args.orbax, mesh=mesh,
    )

    if args.load_full_state:
        print("Loading Optimizer Dict")
        template = {
            "epoch": 0,
            "params": jax.device_get(trainer.params),
            "g_opt_state": jax.device_get(trainer.g_opt_state),
            "d_opt_state": jax.device_get(trainer.d_opt_state),
        }
        state = ckpt.load_full_state(args.load_full_state, template)
        trainer.g_opt_state = ckpt.restore_opt_state(
            state["g_opt_state"], trainer.g_opt_state
        )
        trainer.d_opt_state = ckpt.restore_opt_state(
            state["d_opt_state"], trainer.d_opt_state
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
