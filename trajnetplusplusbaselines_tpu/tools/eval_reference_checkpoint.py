"""Evaluate a *reference-engine* torch checkpoint with this repo's evaluator.

Companion to scripts/reference_control.py (the round-2 VERDICT quality
control): the reference trainer
(/root/reference/trajnetbaselines/lstm/trainer.py) trains on trajdata_split
through tests/reference_harness.py, and this tool closes the loop by running
its saved torch predictor (/root/reference/trajnetbaselines/lstm/lstm.py:280)
scene-by-scene on CPU and scoring the predictions with the same
evaluator/trajnet_evaluator.py used for the TPU framework's own tables — so
the "reference engine, this split" column of RESULTS.md is measured with one
metric stack on one split.

Usage:
    python -m trajnetplusplusbaselines_tpu.tools.eval_reference_checkpoint \
        --path trajdata_split \
        --output OUTPUT_BLOCK/trajdata_split/lstm_vanilla_refctl_seed42.pkl
"""

import argparse
import os
import sys
from contextlib import nullcontext as _nullcontext


class _ReferencePredictor:
    """Adapter: reference torch predictor -> driver's fn(paths, goal) API."""

    def __init__(self, predictor, args):
        self.predictor = predictor
        self.args = args
        self.goal_flag = False  # control runs are not goal-conditioned

    def __call__(self, paths, scene_goal):
        return self.predictor(
            paths,
            scene_goal,
            n_predict=self.args.pred_length,
            obs_length=self.args.obs_length,
            modes=self.args.modes,
            args=self.args,
        )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default="trajdata_split")
    parser.add_argument("--output", nargs="+", required=True,
                        help="reference torch .pkl checkpoint paths")
    parser.add_argument("--obs_length", default=9, type=int)
    parser.add_argument("--pred_length", default=12, type=int)
    parser.add_argument("--write_only", action="store_true")
    parser.add_argument("--disable-collision", dest="disable_collision",
                        action="store_true")
    parser.add_argument("--labels", required=False, nargs="+")
    parser.add_argument("--normalize_scene", action="store_true")
    parser.add_argument("--modes", default=1, type=int)
    parser.add_argument("--module", default="lstm", choices=("lstm", "sgan"),
                        help="which reference engine produced the checkpoint")
    parser.add_argument("--data_root", default=None)
    args = parser.parse_args(argv)

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, repo)
    from tests.reference_harness import load_reference

    load_reference()
    import trajnetbaselines  # noqa: E402  (the reference, as oracle)

    from ..evaluator.driver import ensure_data_block, run_evaluation

    dataset = args.path
    args.path = "DATA_BLOCK/" + args.path + "/test_pred/"
    if args.data_root:
        ensure_data_block(args.data_root, "DATA_BLOCK", [dataset])
    os.makedirs(args.path, exist_ok=True)

    if args.module == "sgan":
        predictor_cls = trajnetbaselines.sgan.SGANPredictor
        safe_cls = trajnetbaselines.sgan.sgan.SGANPredictor
    else:
        predictor_cls = trajnetbaselines.lstm.LSTMPredictor
        safe_cls = trajnetbaselines.lstm.lstm.LSTMPredictor

    predictors = {}
    for model_path in args.output:
        name = (
            model_path.split("/")[-1].replace(".pkl", "")
            + "_modes" + str(args.modes)
        )
        # torch>=2.6 defaults weights_only=True, which rejects the
        # reference's full-object pickle; these checkpoints are produced
        # locally by scripts/reference_control.py, so loading them is safe
        import torch

        with torch.serialization.safe_globals(
            [safe_cls]
        ) if hasattr(torch.serialization, "safe_globals") else _nullcontext():
            try:
                predictor = predictor_cls.load(model_path)
            except Exception:
                import functools

                orig = torch.load
                torch.load = functools.partial(orig, weights_only=False)
                try:
                    predictor = predictor_cls.load(model_path)
                finally:
                    torch.load = orig
        predictors[name] = _ReferencePredictor(predictor, args)

    return run_evaluation(predictors, args)


if __name__ == "__main__":
    main()
