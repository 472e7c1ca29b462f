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
import socket
import sys
import time
from typing import List, Optional

import numpy as np
import optax

from ..data import augmentation, batching
from ..data.reader import Reader


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


def step_lr(lr: float, step_size: Optional[int], gamma: float = 0.1):
    """StepLR schedule over epochs: lr * gamma^(epoch // step_size)."""

    def schedule(epoch: int) -> float:
        if not step_size:
            return lr
        return lr * (gamma ** (epoch // step_size))

    return schedule


def make_optimizer(weight_decay: float = 1e-4):
    """Adam with torch-style coupled weight decay; lr injected per epoch."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=1e-3)


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state

