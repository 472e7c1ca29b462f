"""Classical-baseline parameter-evaluation tool.

Behavioural mirror of /root/reference/trajnetbaselines/classical/socialforce_eval.py:14-261:
an ADE/FDE table for ORCA / social force / Kalman on train datasets, usable
for hyper-parameter tuning with true-goal dictionaries.

Usage:
    python -m trajnetplusplusbaselines_tpu.models.classical.socialforce_eval \
        --data /root/reference/DATA_BLOCK/trajdata/train/biwi_hotel.ndjson \
        --simulator kf
"""

import argparse
import pickle
from itertools import compress
from typing import Optional

from ...data import Reader, TrackRow, interactions
from ...metrics import trajectory as tmetrics
from . import kalman


def filter_interacting_neighbours(paths, obs_length=9, pred_length=12):
    """Keep only collision-avoidance neighbours of the primary.

    End-to-end consumer of data/interactions.py: the reference keeps this
    filter commented out (socialforce_eval.py:36-40 imports
    trajnetplusplustools.interactions.collision_avoidance and selects
    ``[paths[0]] + compress(neigh_paths, interaction_index)``); here it is
    an opt-in ``--interactions`` mode with the identical semantics.
    """
    xy = Reader.paths_to_xy(paths)[: obs_length + pred_length]
    keep = interactions.collision_avoidance(xy, obs_length=obs_length)
    return [paths[0]] + list(compress(paths[1:], keep))


class Evaluator:
    def __init__(self, scenes, dest_dict=None, params=None, args=None):
        self.scenes = scenes
        self.dest = dest_dict
        self.params = params or {}
        self.args = args
        self.average_l2 = {"N": len(scenes)}
        self.final_l2 = {"N": len(scenes)}

    def aggregate(self, name, predictor, dest_type="true"):
        print("evaluating", name)
        average = final = 0.0

        for paths in self.scenes:
            if self.args is not None and getattr(self.args, "interactions", False):
                paths = filter_interacting_neighbours(
                    paths, self.args.obs_length, self.args.pred_length
                )
            if "kf" in name:
                prediction, _ = predictor(
                    paths, n_predict=self.args.pred_length, obs_length=self.args.obs_length
                )[0]
            elif "sf" in name:
                prediction, _ = predictor(
                    paths, self.dest, dest_type, self.params["sf"],
                    n_predict=self.args.pred_length, obs_length=self.args.obs_length,
                )[0]
            elif "orca" in name:
                prediction, _ = predictor(
                    paths, self.dest, dest_type, self.params["orca"],
                    n_predict=self.args.pred_length, obs_length=self.args.obs_length,
                )[0]
            else:
                raise ValueError(name)

            observed = paths[0]
            frame_diff = observed[1].frame - observed[0].frame
            first_frame = observed[self.args.obs_length - 1].frame + frame_diff
            ped_id = observed[0].pedestrian
            rows = [
                TrackRow(first_frame + i * frame_diff, ped_id,
                         float(prediction[i, 0]), float(prediction[i, 1]), 0)
                for i in range(len(prediction))
            ]
            average += tmetrics.average_l2(paths[0], rows)
            final += tmetrics.final_l2(paths[0], rows)

        self.average_l2[name] = average / max(len(self.scenes), 1)
        self.final_l2[name] = final / max(len(self.scenes), 1)
        return self

    def result(self):
        return self.average_l2, self.final_l2


def eval_dataset(input_file, dest_file, simulator, params, args):
    print("dataset", input_file)
    reader = Reader(input_file, scene_type="paths")
    scenes = [s for _, s in reader.scenes(sample=getattr(args, "sample", None))]

    dest_dict = None
    dest_type = "interp"
    if dest_file is not None:
        with open(dest_file, "rb") as f:
            dest_dict = pickle.load(f)
        dest_type = "true"

    evaluator = Evaluator(scenes, dest_dict, params, args)

    if simulator in ("all", "orca"):
        from . import orca

        evaluator.aggregate("orca_" + dest_type, orca.predict, dest_type)
    if simulator in ("all", "sf"):
        from . import socialforce

        evaluator.aggregate("sf_" + dest_type, socialforce.predict, dest_type)
    if simulator in ("all", "kf", "kalman"):
        evaluator.aggregate("kf", kalman.predict)

    return evaluator.result()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--obs_length", default=9, type=int)
    parser.add_argument("--pred_length", default=12, type=int)
    parser.add_argument("--simulator", default="all", choices=("all", "orca", "sf", "kalman", "kf"))
    parser.add_argument("--sample", default=None, type=float,
                        help="scene sample ratio for quick sweeps")
    parser.add_argument("--interactions", action="store_true",
                        help="keep only collision-avoidance neighbours "
                             "(data/interactions.py; the reference's "
                             "commented-out filter)")
    # social force params
    parser.add_argument("--tau", default=0.5, type=float)
    parser.add_argument("--vo", default=2.1, type=float)
    parser.add_argument("--sigma", default=0.3, type=float)
    # ORCA params
    parser.add_argument("--min_dist", default=4, type=float)
    parser.add_argument("--react_time", default=4, type=float)
    parser.add_argument("--radius", default=0.6, type=float)
    parser.add_argument("--data", nargs="+",
                        default=["DATA_BLOCK/trajdata/train/biwi_hotel.ndjson"],
                        help="ndjson files to evaluate on")
    parser.add_argument("--dest_files", nargs="*", default=None,
                        help="true-goal pickles matching --data")
    args = parser.parse_args(argv)

    params = {
        "sf": [args.tau, args.vo, args.sigma],
        "orca": [args.min_dist, args.react_time, args.radius],
    }
    print(params)

    results = {}
    for i, dataset in enumerate(args.data):
        dest_file = args.dest_files[i] if args.dest_files else None
        name = dataset.split("/")[-1].replace(".ndjson", "")
        results[name] = eval_dataset(dataset, dest_file, args.simulator, params, args)

    for title, index in (("## Average L2 [m]", 0), ("## Final L2 [m]", 1)):
        print(title)
        for dataset, rs in results.items():
            r = rs[index]
            cells = "  ".join(f"{k}={v:.2f}" for k, v in r.items() if k != "N")
            print(f"{dataset:>30s} | N={r['N']:>4} | {cells}")
        print("")
    return results


if __name__ == "__main__":
    main()
