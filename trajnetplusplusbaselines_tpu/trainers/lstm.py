"""Command-line LSTM trainer.

Behavioural mirror of /root/reference/trajnetbaselines/lstm/trainer.py:28-535
on the dense scene-axis pipeline: one jitted train step per (scenes, agents)
bucket performs forward (teacher forcing), loss, backward and the optimizer
update entirely on device; the host only shuffles, augments and packs scenes.

Flag surface, output naming (OUTPUT_BLOCK/<data>/lstm_<type>_<suffix>.pkl),
JSON log records (process/train/train-epoch/val-epoch), checkpoint-every-
save_every and the three restore modes match the reference.
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
from ..losses import collision_loss, l2_loss, prediction_loss
from ..models.lstm import LSTM, LSTMPredictor
from ..ops.pooling import make_pool
from ..utils import checkpoint as ckpt
from .common import (
    ResidentDataset,
    cast_compute,
    outputs_f32,
    SceneDataset,
    chunk_sizes_for,
    enable_compilation_cache,
    group_batches,
    log_process_record,
    make_bucket_epoch_runner,
    make_optimizer,
    place_plan_on_mesh,
    set_lr,
    setup_logging,
    shard_carry_on_mesh,
    stack_packed,
    step_lr,
    validate_mesh_batch,
)


class Trainer:
    def __init__(self, model, params, optimizer, lr_schedule, criterion="pred",
                 batch_size=8, obs_length=9, pred_length=12, augment=True,
                 normalize_scene=False, save_every=1, start_length=0,
                 obs_dropout=False, augment_noise=False, val_flag=True,
                 col_wt=0.0, col_distance=0.2, seed=42, mesh=None,
                 compute_dtype=None, orbax=False):
        self.model = model
        # mixed precision: f32 master params + optimizer state; forward and
        # backward run in compute_dtype (bf16 on TPU), losses always f32.
        # The cast lives inside the differentiated function, so gradients
        # arrive back in f32 for Adam.
        self.compute_dtype = compute_dtype
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
        self.val_flag = val_flag
        self.col_wt = col_wt
        self.col_distance = col_distance
        self.orbax = orbax

        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed + 1)
        self._train_step_cache = {}
        self._resident = {}
        self._runner_cache = {}

        # multi-chip: a (data, model) jax.sharding.Mesh.  The resident-epoch
        # path shards each step's scene-batch axis over 'data' (gradients
        # psum over ICI) and TP-shards wide weight matrices over 'model';
        # sequential-SGD semantics and the batch plan are unchanged, so the
        # sharded run reproduces the single-device parameters
        # (tests/test_parallel.py::test_sharded_resident_epoch_*).
        self.mesh = mesh
        self._mesh_placed = False
        validate_mesh_batch(mesh, batch_size)

    # ------------------------------------------------------------- jit steps
    def _loss_from_outputs(self, rel, pred, valid, xy, mask, scene_mask):
        """Primary-only criterion (+ optional collision aux)."""
        targets = (
            xy[self.obs_length : self.seq_length, :, 0]
            - xy[self.obs_length - 1 : self.seq_length - 1, :, 0]
        )  # [pred, S, 2]
        primary_rel = rel[-self.pred_length :, :, 0]  # [pred, S, 5]

        if self.criterion == "L2":
            loss = l2_loss(primary_rel, targets, scene_mask)
        else:
            loss = prediction_loss(primary_rel, targets, scene_mask)

        if self.col_wt:
            positions = xy[-self.pred_length :].at[:, :, 0].set(
                pred[-self.pred_length :, :, 0]
            )
            position_mask = mask[-self.pred_length :].at[:, :, 0].set(
                valid[-self.pred_length :, :, 0]
            )
            loss = loss + collision_loss(
                positions, position_mask, scene_mask, self.col_wt, self.col_distance
            )
        return loss * self.batch_size

    def _cast_compute(self, params):
        return cast_compute(params, self.compute_dtype)

    def _outputs_f32(self, rel, pred, valid):
        return outputs_f32((rel, pred, valid), self.compute_dtype)

    def _forward_train(self, params, xy, mask, goals, slot_mask, start_length):
        observed = xy[start_length : self.obs_length]
        observed_mask = mask[start_length : self.obs_length]
        truth = xy[self.obs_length : self.seq_length - 1]
        truth_mask = mask[self.obs_length : self.seq_length - 1]
        return self._outputs_f32(*self.model.forward(
            self._cast_compute(params), observed, observed_mask, goals,
            slot_mask, prediction_truth=truth, prediction_truth_mask=truth_mask,
        ))

    def _make_train_runner(self, start_length):
        """One jitted lax.scan over a [B, ...] stack of same-shape batches.

        The whole chunk of batches runs as ONE device dispatch (sequential
        SGD semantics preserved by the scan carry); through the remote-TPU
        tunnel this removes the ~30 ms/batch dispatch+sync latency that
        dominated per-batch stepping.
        """

        def loss_fn(params, xy, mask, goals, slot_mask, scene_mask):
            rel, pred, valid = self._forward_train(
                params, xy, mask, goals, slot_mask, start_length
            )
            return self._loss_from_outputs(rel, pred, valid, xy, mask, scene_mask)

        def train_step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run_chunk(params, opt_state, xy, mask, goals, slot_mask, scene_mask):
            (params, opt_state), losses = jax.lax.scan(
                train_step, (params, opt_state),
                (xy, mask, goals, slot_mask, scene_mask),
            )
            return params, opt_state, losses

        return run_chunk

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

    def _place_carry(self):
        """One-time mesh placement of params/opt_state (TP rule + replication)."""
        if self.mesh is None or self._mesh_placed:
            return
        self.params = shard_carry_on_mesh(self.mesh, self.params)
        self.opt_state = shard_carry_on_mesh(self.mesh, self.opt_state)
        self._mesh_placed = True

    def _place_plan(self, idx, valid):
        return place_plan_on_mesh(self.mesh, idx, valid)

    def _train_step_core(self):
        def loss_fn(params, xy, mask, goals, slot_mask, scene_mask):
            rel, pred, valid = self._forward_train(
                params, xy, mask, goals, slot_mask, self.start_length
            )
            return self._loss_from_outputs(rel, pred, valid, xy, mask, scene_mask)

        def step_core(carry, xy, mask, goals, slot, scene, key):
            del key  # deterministic model; augmentation happens in the runner
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, xy, mask, goals, slot, scene
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        return step_core

    def _val_step_core(self):
        start_length = 0 if self.obs_dropout else self.start_length

        def step_core(params, xy, mask, goals, slot, scene, key):
            del key
            rel, pred, valid = self._forward_train(
                params, xy, mask, goals, slot, start_length
            )
            loss = self._loss_from_outputs(rel, pred, valid, xy, mask, scene)
            rel_t, pred_t, valid_t = self._outputs_f32(*self.model.forward(
                self._cast_compute(params),
                xy[start_length : self.obs_length],
                mask[start_length : self.obs_length],
                goals, slot, n_predict=self.pred_length,
            ))
            loss_test = self._loss_from_outputs(rel_t, pred_t, valid_t, xy, mask, scene)
            return params, (loss, loss_test)

        return step_core

    def _resident_epoch(self, scenes, mode, carry, augment=False,
                        augment_noise=False, shuffle=True):
        """Run one epoch over the resident buckets; returns (carry, outs list)."""
        resident = self._get_resident(scenes)
        t0 = time.time()
        plan = resident.epoch_plan(self.batch_size, self.rng, shuffle=shuffle)
        # host-side data work per epoch (the reference's per-batch data_time
        # analogue: here the only host data work is the shuffled batch plan)
        self._host_data_time = time.time() - t0
        outs = []
        for bkey, (idx, valid) in plan.items():
            rkey = (mode, bkey, idx.shape[0])
            if rkey not in self._runner_cache:
                core = self._train_step_core() if mode == "train" else self._val_step_core()
                self._runner_cache[rkey] = make_bucket_epoch_runner(
                    core, augment=augment, augment_noise=augment_noise,
                    obs_length=self.obs_length,
                )
            data = resident.buckets[bkey]
            self.key, sub = jax.random.split(self.key)
            idx_dev, valid_dev = self._place_plan(idx, valid)
            carry, out = self._runner_cache[rkey](
                carry, data["xs"], data["mask"], data["goals"],
                data["num_agents"], idx_dev, valid_dev, sub,
            )
            outs.append(out)
        return carry, outs

    def _get_runner(self, cache, maker, n_chunk, packed, start_length):
        key = (n_chunk, packed.num_scenes, packed.max_agents, start_length)
        if key not in cache:
            cache[key] = maker(start_length)
        return cache[key]

    def _scan_epoch(self, scenes, cache, maker, run, shuffle=True,
                    augment=False, augment_noise=False, draw_start_length=False,
                    start_length=None):
        """Group -> stack -> chunk -> scan an epoch; returns losses per chunk.

        ``run(runner, stacked_arrays)`` performs the dispatch and returns a
        device array of per-batch losses for the chunk.

        Ordering note (mirrors the ResidentDataset caveat): batches are
        grouped by static shape key (scenes, agents, start_length) before
        scanning, so same-shape batches train consecutively rather than in
        the shuffled stream order.  Batch *contents* still reshuffle every
        epoch; only the visit order of shape groups is deterministic.
        """
        if start_length is None:
            start_length = self.start_length
        items = []
        for packed in scenes.epoch_batches(
            self.batch_size, self.rng, augment, augment_noise, shuffle=shuffle
        ):
            sl = (
                int(self.rng.integers(0, self.obs_length - 1))
                if draw_start_length
                else start_length
            )
            items.append((packed, sl))

        groups = group_batches(
            items, lambda it: (it[0].num_scenes, it[0].max_agents, it[1])
        )
        loss_parts = []
        for (_, _, sl), group in groups.items():
            pos = 0
            batches = [it[0] for it in group]
            for n_chunk in chunk_sizes_for(len(batches)):
                chunk = batches[pos : pos + n_chunk]
                pos += n_chunk
                arrays = stack_packed(chunk)
                runner = self._get_runner(cache, maker, n_chunk, chunk[0], sl)
                loss_parts.append(run(runner, arrays))
        return loss_parts

    # ----------------------------------------------------------------- loops
    def loop(self, train_scenes: SceneDataset, val_scenes, out: str, epochs=25,
             start_epoch=0):
        for epoch in range(start_epoch, epochs):
            if epoch % self.save_every == 0:
                self.save_checkpoint(epoch, out + f".epoch{epoch}")
            self.train(train_scenes, epoch)
            if self.val_flag and val_scenes is not None:
                self.val(val_scenes, epoch)
        self.save_checkpoint(epochs, out + f".epoch{epochs}")
        self.save_checkpoint(epochs, out)

    def save_checkpoint(self, epoch: int, filename: str):
        state = {
            "epoch": epoch,
            "params": self.params,
            "opt_state_hyper": {"learning_rate": float(self.lr_schedule(max(epoch - 1, 0)))},
            "opt_state": self.opt_state,
        }
        # predictor pickles evaluate in f32 regardless of the training
        # compute dtype (weights are f32 masters either way)
        import copy

        model = copy.copy(self.model)
        model.compute_dtype = None
        LSTMPredictor(model, self.params).save(state, filename)
        if self.orbax:
            # TPU-native alternative sidecar (SURVEY §5.4): atomic directory
            # checkpoint, restorable with utils.checkpoint.load_orbax and
            # consumable by --load-full-state workflows on pods
            ckpt.save_orbax(state, filename + ".orbax")

    def get_lr(self, epoch: int) -> float:
        return float(self.lr_schedule(epoch))

    def train(self, scenes: SceneDataset, epoch: int):
        start_time = time.time()
        print("epoch", epoch)
        lr = self.get_lr(epoch)
        self.opt_state = set_lr(self.opt_state, lr)

        if not self.obs_dropout:
            # resident fast path: whole epoch in one dispatch per bucket
            self._place_carry()
            (self.params, self.opt_state), loss_parts = self._resident_epoch(
                scenes, "train", (self.params, self.opt_state),
                augment=self.augment, augment_noise=self.augment_noise,
            )
        else:
            # per-batch start_length changes static shapes: chunked-upload path
            def run(runner, arrays):
                self.params, self.opt_state, losses = runner(
                    self.params, self.opt_state, *(jnp.asarray(a) for a in arrays)
                )
                return losses

            loss_parts = self._scan_epoch(
                scenes, self._train_step_cache, self._make_train_runner, run,
                shuffle=True, augment=self.augment, augment_noise=self.augment_noise,
                draw_start_length=True,
            )
        losses = np.concatenate([np.asarray(p) for p in loss_parts])  # sync point
        epoch_loss = float(losses.sum())
        n_batches = len(losses)
        elapsed = time.time() - start_time
        per_batch = elapsed / max(n_batches, 1)

        # periodic train records reconstructed from the device loss trace
        data_time = getattr(self, "_host_data_time", 0.0) / max(n_batches, 1)
        for b in range(10, n_batches + 1, 10):
            self.log.info({
                "type": "train",
                "epoch": epoch, "batch": b * self.batch_size,
                "n_batches": len(scenes),
                "time": round(per_batch, 4),
                "data_time": round(data_time, 6),
                "lr": lr,
                "loss": round(float(losses[b - 1]), 3),
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
        val_loss = float(sum(jnp.sum(p[0]) for p in parts))
        test_loss = float(sum(jnp.sum(p[1]) for p in parts))

        self.log.info({
            "type": "val-epoch",
            "epoch": epoch + 1,
            "loss": round(val_loss / max(len(scenes), 1), 3),
            "test_loss": round(test_loss / max(len(scenes), 1), 3),
            "time": round(time.time() - eval_start, 1),
        })


def add_arguments(parser, default_epochs=25):
    parser.add_argument("--epochs", default=default_epochs, type=int)
    parser.add_argument("--save_every", default=5, type=int)
    parser.add_argument("--obs_length", default=9, type=int)
    parser.add_argument("--pred_length", default=12, type=int)
    parser.add_argument("--start_length", default=0, type=int)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--clip_grad", default=None, type=float,
                        help="optional global-norm gradient clip (stabilizes "
                             "attention pooling across seeds)")
    parser.add_argument("--step_size", default=10, type=int)
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--path", default="trajdata", help="dataset name inside data_root")
    parser.add_argument("--data_root", default="DATA_BLOCK", help="root holding <path>/train etc.")
    parser.add_argument("--goals", action="store_true")
    parser.add_argument("--loss", default="pred", choices=("L2", "pred"))
    parser.add_argument(
        "--type", default="vanilla",
        choices=("vanilla", "occupancy", "directional", "social", "dir_social",
                 "hiddenstatemlp", "nn", "attentionmlp", "nn_lstm", "traj_pool", "nmmp"),
    )
    parser.add_argument("--sample", default=1.0, type=float)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--normalize_scene", action="store_true")
    parser.add_argument("--augment_noise", action="store_true")
    parser.add_argument("--obs_dropout", action="store_true")

    parser.add_argument("--orbax", action="store_true",
                        help="also write each checkpoint's training state as "
                             "an Orbax directory (<out>.orbax) next to the "
                             "reference-style pickle")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision training: bf16 forward/backward "
                             "on the MXU with f32 master params, optimizer "
                             "state, and losses")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint each recurrence step: ~T-fold "
                             "lower activation HBM for a ~1.3x backward "
                             "recompute (needed for wide attention pools "
                             "under vmapped ensembles)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the axon TPU plugin "
                             "ignores JAX_PLATFORMS; pair with "
                             "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                             "for a virtual multi-device mesh)")

    parallel = parser.add_argument_group("parallelism")
    parallel.add_argument("--dp", type=int, default=1,
                          help="data-parallel ways: shard each batch's scene "
                               "axis over the mesh 'data' axis")
    parallel.add_argument("--tp", type=int, default=1,
                          help="tensor-parallel ways: shard wide weight "
                               "matrices over the mesh 'model' axis")

    pretrain = parser.add_argument_group("pretraining")
    pretrain.add_argument("--load-state", default=None)
    pretrain.add_argument("--load-full-state", default=None)
    pretrain.add_argument("--nonstrict-load-state", default=None)

    hyper = parser.add_argument_group("hyperparameters")
    hyper.add_argument("--hidden-dim", dest="hidden_dim", type=int, default=128)
    hyper.add_argument("--coordinate-embedding-dim", dest="coordinate_embedding_dim",
                       type=int, default=64)
    hyper.add_argument("--pool_dim", type=int, default=256)
    hyper.add_argument("--goal_dim", type=int, default=64)
    hyper.add_argument("--cell_side", type=float, default=0.6)
    hyper.add_argument("--n", type=int, default=12)
    hyper.add_argument("--layer_dims", type=int, nargs="*", default=[512])
    hyper.add_argument("--embedding_arch", default="one_layer")
    hyper.add_argument("--pool_constant", default=0, type=int)
    hyper.add_argument("--norm_pool", action="store_true")
    hyper.add_argument("--front", action="store_true")
    hyper.add_argument("--latent_dim", type=int, default=16)
    hyper.add_argument("--norm", default=0, type=int)
    hyper.add_argument("--no_vel", action="store_true")
    hyper.add_argument("--spatial_dim", type=int, default=32)
    hyper.add_argument("--vel_dim", type=int, default=32)
    hyper.add_argument("--attn_logit_cap", type=float, default=None,
                       help="tanh soft-cap on attentionmlp softmax logits "
                            "(training-stability fix; None = reference "
                            "semantics, see RESULTS.md)")
    hyper.add_argument("--neigh", default=4, type=int)
    hyper.add_argument("--mp_iters", default=5, type=int)
    hyper.add_argument("--col_wt", default=0.0, type=float)
    hyper.add_argument("--col_distance", default=0.2, type=float)
    return parser


def main(epochs=25, argv=None):
    parser = argparse.ArgumentParser()
    add_arguments(parser, epochs)
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    random.seed(args.seed)
    np.random.seed(args.seed)
    enable_compilation_cache()

    if not os.path.exists(f"OUTPUT_BLOCK/{args.path}"):
        os.makedirs(f"OUTPUT_BLOCK/{args.path}")
    prefix = "lstm_goals" if args.goals else "lstm"
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
        if args.obs_dropout:
            raise SystemExit("--obs_dropout uses the chunked host path, which "
                             "is single-device; drop --dp/--tp")

    trainer = Trainer(
        model, params, optimizer, lr_schedule, criterion=args.loss,
        batch_size=args.batch_size, obs_length=args.obs_length,
        pred_length=args.pred_length, augment=args.augment,
        normalize_scene=args.normalize_scene, save_every=args.save_every,
        start_length=args.start_length, obs_dropout=args.obs_dropout,
        augment_noise=args.augment_noise, val_flag=val_flag, col_wt=args.col_wt,
        col_distance=args.col_distance, seed=args.seed, mesh=mesh,
        compute_dtype=compute_dtype, orbax=args.orbax,
    )

    if args.load_full_state:
        print("Loading Optimizer Dict")
        template = {
            "epoch": 0,
            "params": jax.device_get(trainer.params),
            "opt_state_hyper": {"learning_rate": 0.0},
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
        if val_scenes is not None
        else None
    )
    trainer.loop(train_ds, val_ds, args.output, epochs=args.epochs, start_epoch=start_epoch)


if __name__ == "__main__":
    main()
