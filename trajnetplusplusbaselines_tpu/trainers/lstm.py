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
    SceneDataset,
    log_process_record,
    make_optimizer,
    set_lr,
    setup_logging,
    step_lr,
)


class Trainer:
    def __init__(self, model, params, optimizer, lr_schedule, criterion="pred",
                 batch_size=8, obs_length=9, pred_length=12, augment=True,
                 normalize_scene=False, save_every=1, start_length=0,
                 obs_dropout=False, augment_noise=False, val_flag=True,
                 col_wt=0.0, col_distance=0.2, seed=42):
        self.model = model
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

        self.rng = np.random.default_rng(seed)
        self._train_step_cache = {}
        self._val_step_cache = {}

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

    def _forward_train(self, params, xy, mask, goals, slot_mask, start_length):
        observed = xy[start_length : self.obs_length]
        observed_mask = mask[start_length : self.obs_length]
        truth = xy[self.obs_length : self.seq_length - 1]
        truth_mask = mask[self.obs_length : self.seq_length - 1]
        return self.model.forward(
            params, observed, observed_mask, goals, slot_mask,
            prediction_truth=truth, prediction_truth_mask=truth_mask,
        )

    def _make_train_step(self, start_length):
        def loss_fn(params, xy, mask, goals, slot_mask, scene_mask):
            rel, pred, valid = self._forward_train(
                params, xy, mask, goals, slot_mask, start_length
            )
            return self._loss_from_outputs(rel, pred, valid, xy, mask, scene_mask)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, xy, mask, goals, slot_mask, scene_mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, xy, mask, goals, slot_mask, scene_mask
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        return train_step

    def _make_val_step(self, start_length):
        def val_step(params, xy, mask, goals, slot_mask, scene_mask):
            rel, pred, valid = self._forward_train(
                params, xy, mask, goals, slot_mask, start_length
            )
            loss = self._loss_from_outputs(rel, pred, valid, xy, mask, scene_mask)
            rel_t, pred_t, valid_t = self.model.forward(
                params,
                xy[start_length : self.obs_length],
                mask[start_length : self.obs_length],
                goals, slot_mask, n_predict=self.pred_length,
            )
            loss_test = self._loss_from_outputs(rel_t, pred_t, valid_t, xy, mask, scene_mask)
            return loss, loss_test

        return jax.jit(val_step)

    def _get_step(self, cache, maker, packed, start_length):
        key = (packed.num_scenes, packed.max_agents, start_length)
        if key not in cache:
            cache[key] = maker(start_length)
        return cache[key]

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
        LSTMPredictor(self.model, self.params).save(state, filename)

    def get_lr(self, epoch: int) -> float:
        return float(self.lr_schedule(epoch))

    def train(self, scenes: SceneDataset, epoch: int):
        start_time = time.time()
        print("epoch", epoch)
        lr = self.get_lr(epoch)
        self.opt_state = set_lr(self.opt_state, lr)

        start_length = self.start_length
        epoch_loss = 0.0
        scene_i = 0
        last_loss, preprocess_time, total_time = 0.0, 0.0, 0.0
        for packed in scenes.epoch_batches(
            self.batch_size, self.rng, self.augment, self.augment_noise
        ):
            scene_start = time.time()
            if self.obs_dropout:
                start_length = int(self.rng.integers(0, self.obs_length - 1))

            slot_mask = np.arange(packed.max_agents)[None] < packed.num_agents[:, None]
            scene_mask = packed.num_agents > 0
            preprocess_time = time.time() - scene_start

            step = self._get_step(self._train_step_cache, self._make_train_step,
                                  packed, start_length)
            self.params, self.opt_state, loss = step(
                self.params,
                self.opt_state,
                jnp.asarray(packed.xy),
                jnp.asarray(packed.mask),
                jnp.asarray(packed.goals),
                jnp.asarray(slot_mask),
                jnp.asarray(scene_mask),
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
                    "data_time": round(preprocess_time, 3),
                    "lr": lr,
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
        val_loss, test_loss = 0.0, 0.0
        start_length = 0 if self.obs_dropout else self.start_length

        for packed in scenes.epoch_batches(self.batch_size, self.rng, shuffle=False):
            slot_mask = np.arange(packed.max_agents)[None] < packed.num_agents[:, None]
            scene_mask = packed.num_agents > 0
            step = self._get_step(self._val_step_cache, self._make_val_step,
                                  packed, start_length)
            loss, loss_test = step(
                self.params,
                jnp.asarray(packed.xy),
                jnp.asarray(packed.mask),
                jnp.asarray(packed.goals),
                jnp.asarray(slot_mask),
                jnp.asarray(scene_mask),
            )
            val_loss += float(loss)
            test_loss += float(loss_test)

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
    hyper.add_argument("--neigh", default=4, type=int)
    hyper.add_argument("--mp_iters", default=5, type=int)
    hyper.add_argument("--col_wt", default=0.0, type=float)
    hyper.add_argument("--col_distance", default=0.2, type=float)
    return parser


def main(epochs=25, argv=None):
    parser = argparse.ArgumentParser()
    add_arguments(parser, epochs)
    args = parser.parse_args(argv)

    random.seed(args.seed)
    np.random.seed(args.seed)

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
    params = model.init_params(jax.random.PRNGKey(args.seed))

    optimizer = make_optimizer(weight_decay=1e-4)
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

    trainer = Trainer(
        model, params, optimizer, lr_schedule, criterion=args.loss,
        batch_size=args.batch_size, obs_length=args.obs_length,
        pred_length=args.pred_length, augment=args.augment,
        normalize_scene=args.normalize_scene, save_every=args.save_every,
        start_length=args.start_length, obs_dropout=args.obs_dropout,
        augment_noise=args.augment_noise, val_flag=val_flag, col_wt=args.col_wt,
        col_distance=args.col_distance, seed=args.seed,
    )

    if args.load_full_state:
        print("Loading Optimizer Dict")
        state = ckpt.load_state(args.load_full_state)
        trainer.opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
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
