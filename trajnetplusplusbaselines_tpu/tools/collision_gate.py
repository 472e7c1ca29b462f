"""Drive the collision_test Pass/Fail gate for trained checkpoints.

The reference renders a Col_test column per model
(/root/reference/evaluator/trajnet_evaluator.py:195-207): the model predicts
one synthetic head-on scene (DATA_BLOCK/collision_test) and passes iff the
predicted primary/neighbour tracks never collide.  Protocol evals that
include collision_test.ndjson in their test dir populate the gate natively;
this tool backfills it for checkpoints whose prediction dirs predate the
gate scene (or were cleaned from disk) WITHOUT re-running their full test
split:

- if ``test_pred/<model>_modes<k>/`` exists, the gate prediction is written
  there (same file the evaluator's own gate reads);
- otherwise it goes to ``gate_pred/<model>_modes<k>/`` so a stub dir never
  poisons the evaluator's skip-if-exists prediction cache.

Results append to ``DATA_BLOCK/<path>/collision_gate.json`` and are picked
up by tools/collect_results.

Usage:
    python -m trajnetplusplusbaselines_tpu.tools.collision_gate \
        --path trajdata_split --cpu \
        --output OUTPUT_BLOCK/trajdata_split/lstm_vanilla_seed42.pkl [...]
"""

import argparse
import json
import os


def gate_one(model_path: str, args) -> str:
    """Predict the collision_test scene for one checkpoint; return Pass/Fail."""
    from ..evaluator.driver import list_test_datasets
    from ..evaluator.learned import BatchedPredictor
    from ..evaluator.trajnet_evaluator import collision_test
    from ..evaluator.write_utils import (
        load_test_datasets, preprocess_test, write_predictions,
    )
    from ..utils.checkpoint import load_predictor

    name = model_path.split("/")[-1].replace(".pkl", "") + "_modes" + str(args.modes)
    test_pred_dir = os.path.join(args.test_pred, name)
    root = args.test_pred if os.path.isdir(test_pred_dir) else args.gate_pred
    out_file = os.path.join(root, name, "collision_test.ndjson")

    if not os.path.exists(out_file):
        if "collision_test" not in list_test_datasets(args.test_pred):
            raise SystemExit(
                "collision_test.ndjson is not in this split's test dir; copy "
                "it from the reference DATA_BLOCK first"
            )
        predictor = BatchedPredictor(
            load_predictor(model_path), modes=args.modes,
            batch_scenes=args.batch_scenes,
        )
        goal_flag = getattr(predictor, "goal_flag", False)

        class _A:  # write_utils reads .path/.obs_length/.pred_length
            path = args.test_pred  # load reads <path>/../test/
            obs_length = args.obs_length
            pred_length = args.pred_length

        dataset_name, scenes, scene_goals = load_test_datasets(
            "collision_test", goal_flag, _A
        )
        processed = [preprocess_test(s, args.obs_length) for _, _, s in scenes]
        if hasattr(predictor, "predict_dataset"):
            pred_list = predictor.predict_dataset(processed, scene_goals, _A)
        else:
            pred_list = [predictor(p, g) for p, g in zip(processed, scene_goals)]
        pred_list = [[p[m] for m in range(len(p))] for p in pred_list]
        _A.path = root
        write_predictions(pred_list, scenes, name, dataset_name, _A)

    class _G:  # collision_test() reads .path/.pred_length
        path = root if root.endswith("/") else root + "/"
        pred_length = args.pred_length

    return collision_test(["collision_test.ndjson"], name, _G)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default="trajdata_split")
    parser.add_argument("--output", nargs="+", required=True, help="model .pkl paths")
    parser.add_argument("--modes", default=1, type=int)
    parser.add_argument("--obs_length", default=9, type=int)
    parser.add_argument("--pred_length", default=12, type=int)
    parser.add_argument("--batch_scenes", default=4, type=int)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (one tiny scene per model "
                             "does not need the TPU)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..trainers.common import enable_compilation_cache

    enable_compilation_cache()

    block = os.path.join("DATA_BLOCK", args.path)
    args.test_pred = os.path.join(block, "test_pred") + "/"
    args.gate_pred = os.path.join(block, "gate_pred") + "/"

    gate_file = os.path.join(block, "collision_gate.json")
    results = {}
    if os.path.exists(gate_file):
        with open(gate_file) as f:
            results = json.load(f)

    for model_path in args.output:
        name = (model_path.split("/")[-1].replace(".pkl", "")
                + "_modes" + str(args.modes))
        results[name] = gate_one(model_path, args)
        print(f"{name:60s} Col_test: {results[name]}", flush=True)
        with open(gate_file, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)

    return results


if __name__ == "__main__":
    main()
