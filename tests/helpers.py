"""Shared fixtures: synthetic ndjson scenes for data/evaluator tests."""

import json
import math
import os

NAN = float("nan")


def write_ndjson_scene(path, scenes):
    """scenes: list of dicts {id, p, s, e, tag, tracks: [(f, p, x, y), ...]}."""
    with open(path, "w") as f:
        for scene in scenes:
            f.write(
                json.dumps(
                    {
                        "scene": {
                            "id": scene["id"],
                            "p": scene["p"],
                            "s": scene["s"],
                            "e": scene["e"],
                            "fps": 2.5,
                            "tag": scene.get("tag", [2, []]),
                        }
                    }
                )
                + "\n"
            )
            for (fr, p, x, y) in scene["tracks"]:
                f.write(json.dumps({"track": {"f": fr, "p": p, "x": x, "y": y}}) + "\n")


def linear_tracks(ped, x0, y0, vx, vy, frames):
    return [(f, ped, x0 + i * vx, y0 + i * vy) for i, f in enumerate(frames)]


def make_synthetic_dataset(root, n_scenes=4, seq_length=21, n_neighbours=2):
    """A tiny train/val/test dataset tree under root, returns root."""
    for subset in ("train", "val", "test", "test_private"):
        os.makedirs(os.path.join(root, subset), exist_ok=True)
        scenes = []
        for sid in range(n_scenes):
            frames = list(range(sid * 1000, sid * 1000 + seq_length * 10, 10))
            tracks = linear_tracks(1, 0.0 + sid, 0.0, 0.1, 0.2, frames)
            for nb in range(n_neighbours):
                angle = 2 * math.pi * (nb + 1) / (n_neighbours + 1)
                tracks += linear_tracks(
                    2 + nb, math.cos(angle) + sid, math.sin(angle), 0.1, 0.15, frames
                )
            scenes.append(
                {
                    "id": sid,
                    "p": 1,
                    "s": frames[0],
                    "e": frames[-1],
                    "tag": [2 + (sid % 2), [2]] if sid % 2 else [2, []],
                    "tracks": tracks,
                }
            )
        write_ndjson_scene(os.path.join(root, subset, "synth.ndjson"), scenes)
    return root
