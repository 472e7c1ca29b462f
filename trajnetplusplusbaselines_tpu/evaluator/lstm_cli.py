"""CLI: evaluate trained LSTM-family models.

Mirror of /root/reference/trajnetbaselines/lstm/trajnet_evaluator.py:68-107
(same CLI shape for the sgan/vae variants), with whole-dataset batched device
rollout instead of the 12-process joblib fan-out.

Usage:
    python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
        --path trajdata_split --output OUTPUT_BLOCK/trajdata_split/lstm_vanilla_None.pkl
"""

import argparse
import os

from ..utils.checkpoint import load_predictor
from .driver import ensure_data_block, run_evaluation
from .learned import BatchedPredictor


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default="trajdata", help="directory of data to test")
    parser.add_argument("--output", nargs="+", required=True, help="model .pkl paths")
    parser.add_argument("--obs_length", default=9, type=int)
    parser.add_argument("--pred_length", default=12, type=int)
    parser.add_argument("--write_only", action="store_true")
    parser.add_argument("--disable-collision", dest="disable_collision", action="store_true")
    parser.add_argument("--labels", required=False, nargs="+")
    parser.add_argument("--normalize_scene", action="store_true")
    parser.add_argument("--modes", default=1, type=int)
    parser.add_argument("--batch_scenes", default=64, type=int,
                        help="device batch size for rollout")
    parser.add_argument("--data_root", default=None,
                        help="read-only source DATA_BLOCK to link test/test_private from")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the TPU tunnel can be slow/flaky)")
    parser.add_argument("--fill_missing", action="store_true",
                        help="backfill mode: keep existing prediction dirs and "
                             "predict only test datasets they lack (e.g. the "
                             "collision_test gate scene)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..trainers.common import enable_compilation_cache

    enable_compilation_cache()

    dataset = args.path
    args.path = "DATA_BLOCK/" + args.path + "/test_pred/"
    if args.data_root:
        ensure_data_block(args.data_root, "DATA_BLOCK", [dataset])
    os.makedirs(args.path, exist_ok=True)

    predictors = {}
    for model_path in args.output:
        name = model_path.split("/")[-1].replace(".pkl", "") + "_modes" + str(args.modes)
        predictor = load_predictor(model_path)
        # goal-conditioned models need the test goal files at prediction time;
        # BatchedPredictor carries the flag per model (mirrors
        # /root/reference/trajnetbaselines/lstm/trajnet_evaluator.py:52)
        predictors[name] = BatchedPredictor(
            predictor, modes=args.modes, batch_scenes=args.batch_scenes
        )

    return run_evaluation(predictors, args)


if __name__ == "__main__":
    main()
