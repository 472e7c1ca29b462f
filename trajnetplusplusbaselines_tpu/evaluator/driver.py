"""Prediction + evaluation driver.

Replaces the reference's per-model evaluator scripts
(/root/reference/trajnetbaselines/lstm/trajnet_evaluator.py:15-107 and
classical/trajnet_evaluator.py:47-96).  The reference fans prediction out to
12 joblib processes; here learned models batch whole datasets onto the device
while classical predictors run vectorized on host.  Skip-if-exists caching
and the --write_only escape hatch are preserved.
"""

import os
from typing import Callable, Dict, List

from .write_utils import load_test_datasets, preprocess_test, write_predictions


def ensure_data_block(data_root: str, local_root: str, datasets: List[str]) -> None:
    """Symlink read-only source datasets into the writable DATA_BLOCK tree."""
    for name in datasets:
        src = os.path.join(data_root, name)
        dst = os.path.join(local_root, name)
        os.makedirs(dst, exist_ok=True)
        for subset in ("test", "test_private"):
            src_sub = os.path.join(src, subset)
            dst_sub = os.path.join(dst, subset)
            if os.path.isdir(src_sub) and not os.path.exists(dst_sub):
                os.symlink(os.path.abspath(src_sub), dst_sub)


def list_test_datasets(path: str) -> List[str]:
    """Dataset stems in the test dir (args.path is .../test_pred/)."""
    # replace only the trailing test_pred component — a blanket
    # str.replace("_pred", "") would corrupt any other "_pred" in the path
    head, sep, _ = path.rstrip("/").rpartition("/")
    test_dir = (head + sep if sep else "") + "test"
    return sorted(
        f.replace(".ndjson", "")
        for f in os.listdir(test_dir)
        if f.endswith(".ndjson")
    )


def get_predictions(predictors: Dict[str, Callable], args) -> None:
    """Write test_pred ndjson files for every (model, dataset) pair.

    predictors: {model_name: fn(paths, scene_goal) -> {mode: (primary, neighs)}}

    Multi-process: when run under a multi-host JAX runtime each process
    predicts its ``process_slice`` of the datasets (the pod-native
    replacement for the reference's 12-way joblib fan-out,
    /root/reference/trajnetbaselines/lstm/trajnet_evaluator.py:61); the
    final tmp-dir -> model-dir rename happens on process 0 after a barrier.
    """
    from ..parallel.multihost import shard_items

    multiproc = _multihost_runtime()
    if multiproc:
        import jax
    datasets = list_test_datasets(args.path)

    fill_missing = getattr(args, "fill_missing", False)
    if fill_missing and multiproc:
        raise ValueError("--fill_missing is a single-process backfill mode")

    for model_name, predictor in predictors.items():
        model_dir = os.path.join(args.path, model_name)
        todo = datasets
        if fill_missing and os.path.exists(model_dir):
            # backfill mode: keep the existing prediction dir, predict only
            # the test datasets it has no output file for (e.g. adding the
            # collision_test gate scene to already-evaluated models)
            todo = [
                d for d in datasets
                if not os.path.exists(os.path.join(model_dir, d + ".ndjson"))
            ]
            if not todo:
                print(f"Predictions corresponding to {model_name} already exist.")
                continue
        skip = os.path.exists(model_dir) and not fill_missing
        if multiproc:
            # decide the skip on process 0 and broadcast it: NFS attribute
            # caching can make model_dir visibility diverge across hosts
            # right after process 0's rename, and a divergent branch here
            # would leave the other hosts blocked in the barriers below
            from ..parallel.multihost import broadcast_from_zero

            skip = bool(broadcast_from_zero(skip))
        if skip:
            print(f"Predictions corresponding to {model_name} already exist.")
            print("Loading the saved predictions")
            continue
        # write into a temp dir and rename at the end: an interrupted run must
        # not leave a partial dir that the skip-if-exists cache would trust
        tmp_dir = model_dir + ".tmp"
        if not multiproc or jax.process_index() == 0:
            if os.path.exists(tmp_dir):
                import shutil

                shutil.rmtree(tmp_dir)
            os.makedirs(tmp_dir, exist_ok=True)
        if multiproc:
            # assumes a filesystem shared across hosts (NFS/GCS-fuse); the
            # barrier orders process 0's cleanup before anyone writes
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"pred-start:{model_name}")

        # goal files load only for predictors that need them (per-predictor
        # flag, like the reference's per-model goal_flag resolution); a mixed
        # goal/non-goal model list must not fail on missing goal files
        goal_flag = getattr(
            predictor, "goal_flag", getattr(args, "goal_flag", False)
        )

        for dataset in (shard_items(todo) if multiproc else todo):
            dataset_name, scenes, scene_goals = load_test_datasets(
                dataset, goal_flag, args
            )
            processed = [preprocess_test(s, args.obs_length) for _, _, s in scenes]
            if hasattr(predictor, "predict_dataset"):
                pred_list = predictor.predict_dataset(processed, scene_goals, args)
            else:
                pred_list = [
                    predictor(paths, goal)
                    for paths, goal in zip(processed, scene_goals)
                ]
            # predictions keyed by mode index -> ordered list
            pred_list = [
                [p[m] for m in range(len(p))] for p in pred_list
            ]
            write_predictions(pred_list, scenes, model_name + ".tmp", dataset_name, args)

        if multiproc:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"predictions:{model_name}")
            if jax.process_index() == 0:
                os.rename(tmp_dir, model_dir)
            # second barrier: no host may proceed (e.g. into evaluation)
            # until the rename has been published
            multihost_utils.sync_global_devices(f"published:{model_name}")
        elif fill_missing and os.path.exists(model_dir):
            # move the backfilled files into the existing dir one by one
            for f in os.listdir(tmp_dir):
                os.replace(os.path.join(tmp_dir, f), os.path.join(model_dir, f))
            os.rmdir(tmp_dir)
        else:
            os.rename(tmp_dir, model_dir)


def _multihost_runtime() -> bool:
    """True iff this is a multi-process JAX runtime.

    Uses ``jax.distributed.is_initialized()`` — set only by
    ``jax.distributed.initialize`` — so the check never forces backend
    creation (classical / torch-oracle evals must not become TPU clients
    just to predict on CPU).  A single-process distributed init still
    returns False via process_count.
    """
    try:
        import jax.distributed

        if not jax.distributed.is_initialized():
            return False
        import jax

        return jax.process_count() > 1
    except Exception:  # pragma: no cover - very old jax
        return False


def run_evaluation(predictors: Dict[str, Callable], args):
    get_predictions(predictors, args)
    if getattr(args, "write_only", False):
        return None
    if _multihost_runtime():
        # metrics aggregate over the full prediction tree; one process
        # computes and writes them, the rest just synchronized above
        import jax

        if jax.process_index() != 0:
            return None
    from .trajnet_evaluator import trajnet_evaluate

    return trajnet_evaluate(args)
