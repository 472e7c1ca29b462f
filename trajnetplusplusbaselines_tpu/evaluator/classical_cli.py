"""CLI: evaluate the classical (non-learned) predictors.

Mirror of /root/reference/trajnetbaselines/classical/trajnet_evaluator.py:47-149
with the joblib process fan-out replaced by in-process vectorized prediction.

Usage:
    python -m trajnetplusplusbaselines_tpu.evaluator.classical_cli \
        --path trajdata --cv --kf [--data_root /root/reference/DATA_BLOCK]
"""

import argparse
import functools
import os

from .driver import ensure_data_block, run_evaluation


def build_predictors(args):
    predictors = {}

    def add(name, fn):
        predictors[name + "_modes" + str(args.modes)] = fn

    if args.kf:
        from ..models.classical import kalman

        add("kf", functools.partial(_no_goal(kalman.predict), args=args))
    if args.sf:
        from ..models.classical import socialforce

        add("sf", functools.partial(_no_goal(socialforce.predict), args=args))
        add(
            "sf_opt",
            functools.partial(
                _no_goal(socialforce.predict), args=args, sf_params=[0.5, 5.0, 0.3]
            ),
        )
    if args.orca:
        from ..models.classical import orca

        add("orca", functools.partial(_no_goal(orca.predict), args=args))
        add(
            "orca_opt",
            functools.partial(
                _no_goal(orca.predict), args=args, orca_params=[0.4, 1.0, 0.3]
            ),
        )
    if args.cv:
        from ..models.classical import constant_velocity

        add("cv", functools.partial(_no_goal(constant_velocity.predict), args=args))
    return predictors


def _no_goal(predict_fn):
    """Adapt classical predict(paths, ...) to the (paths, goal) interface."""

    def fn(paths, scene_goal, args=None, **kwargs):
        return predict_fn(
            paths,
            n_predict=args.pred_length,
            obs_length=args.obs_length,
            **kwargs,
        )

    return fn


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default="trajdata", help="directory of data to test")
    parser.add_argument("--output", nargs="+", default=[], help="relative paths of saved models")
    parser.add_argument("--obs_length", default=9, type=int)
    parser.add_argument("--pred_length", default=12, type=int)
    parser.add_argument("--write_only", action="store_true")
    parser.add_argument("--disable-collision", dest="disable_collision", action="store_true")
    parser.add_argument("--labels", required=False, nargs="+")
    parser.add_argument("--normalize_scene", action="store_true")
    parser.add_argument("--modes", default=1, type=int)
    parser.add_argument("--sf", action="store_true", help="evaluate social force")
    parser.add_argument("--orca", action="store_true", help="evaluate ORCA")
    parser.add_argument("--kf", action="store_true", help="evaluate Kalman filter")
    parser.add_argument("--cv", action="store_true", help="evaluate constant velocity")
    parser.add_argument(
        "--data_root",
        default=None,
        help="read-only source DATA_BLOCK to link test/test_private from",
    )
    parser.add_argument("--fill_missing", action="store_true",
                        help="backfill mode: keep existing prediction dirs and "
                             "predict only test datasets they lack")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (classical predictors "
                             "must not become TPU clients)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    dataset = args.path
    args.path = "DATA_BLOCK/" + args.path + "/test_pred/"
    if args.data_root:
        ensure_data_block(args.data_root, "DATA_BLOCK", [dataset])

    predictors = build_predictors(args)
    if not predictors:
        raise SystemExit("No handcrafted baseline mentioned (use --cv/--kf/--sf/--orca)")

    # evaluator derives folder names from args.output
    args.output = ["/" + name.replace("_modes" + str(args.modes), "") + ".pkl"
                   for name in predictors]
    os.makedirs(args.path, exist_ok=True)
    return run_evaluation(predictors, args)


if __name__ == "__main__":
    main()
