import math
import os

import numpy as np
import pytest

from trajnetplusplusbaselines_tpu.data import (
    Reader,
    TrackRow,
    add_noise,
    center_scene,
    drop_distant,
    inverse_scene,
    pack_scenes,
    nan_to_mask,
    mask_to_nan,
    agent_bucket,
    batch_iterator,
    unpack_scene,
    writers,
)

from .helpers import make_synthetic_dataset

NAN = float("nan")


def test_reader_roundtrip(tmp_path):
    root = make_synthetic_dataset(str(tmp_path))
    reader = Reader(os.path.join(root, "train", "synth.ndjson"), scene_type="paths")
    scenes = list(reader.scenes())
    assert len(scenes) == 4
    sid, paths = scenes[0]
    assert sid == 0
    assert len(paths) == 3  # primary + 2 neighbours
    assert paths[0][0].pedestrian == 1  # primary first

    xy = Reader.paths_to_xy(paths)
    assert xy.shape == (21, 3, 2)
    assert not np.isnan(xy).any()
    # primary track values
    assert xy[0, 0, 0] == pytest.approx(0.0)
    assert xy[1, 0, 1] == pytest.approx(0.2)


def test_reader_tags_and_scene_rows(tmp_path):
    root = make_synthetic_dataset(str(tmp_path))
    reader = Reader(os.path.join(root, "train", "synth.ndjson"), scene_type="paths")
    tags = {sid: reader.scenes_by_id[sid].tag for sid, _ in reader.scenes()}
    assert tags[0] == [2, []]
    assert tags[1] == [3, [2]]


def test_paths_to_xy_partial_tracks():
    paths = [
        [TrackRow(0, 1, 1.0, 1.0), TrackRow(10, 1, 1.0, 1.0), TrackRow(20, 1, 1.0, 1.0)],
        [TrackRow(10, 2, 2.0, 2.0), TrackRow(20, 2, 2.0, 2.0)],
        [TrackRow(0, 3, 3.0, 3.0), TrackRow(10, 3, 3.0, 3.0)],
    ]
    xy = Reader.paths_to_xy(paths)
    assert xy.shape == (3, 3, 2)
    assert np.isnan(xy[0, 1]).all()
    assert np.isnan(xy[2, 2]).all()
    assert xy[1, 1, 0] == 2.0


def test_drop_distant_nan_semantics():
    # mirrors the behavioural intent of the reference test
    # (/root/reference/tests/test_lstm_loss.py:46-60)
    paths = [
        [TrackRow(0, 1, 1.0, 1.0), TrackRow(10, 1, 1.0, 1.0), TrackRow(20, 1, 1.0, 1.0)],
        [TrackRow(10, 2, 2.0, 2.0), TrackRow(20, 2, 2.0, 2.0)],
        [TrackRow(0, 3, 3.0, 3.0), TrackRow(10, 3, 3.0, 3.0)],
        [TrackRow(0, 4, 40.0, 40.0), TrackRow(10, 4, 40.0, 40.0)],
    ]
    xy = Reader.paths_to_xy(paths)
    out, mask = drop_distant(xy)
    assert mask.tolist() == [True, True, True, False]
    expected = np.array(
        [
            [[1.0, 1.0], [NAN, NAN], [3.0, 3.0]],
            [[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]],
            [[1.0, 1.0], [2.0, 2.0], [NAN, NAN]],
        ]
    )
    assert out == pytest.approx(expected, nan_ok=True)


def test_center_scene_and_inverse():
    t = np.arange(21, dtype=float)
    xy = np.stack([np.stack([t * 0.3 + 1.0, t * -0.1 + 2.0], axis=-1)], axis=1)  # [21,1,2]
    centered, rotation, center = center_scene(xy, obs_length=9)
    # last observation at origin
    assert centered[8, 0] == pytest.approx([0.0, 0.0], abs=1e-9)
    # primary heading north: displacement between obs 7 and 8 along +y
    step = centered[8, 0] - centered[7, 0]
    assert step[0] == pytest.approx(0.0, abs=1e-9)
    assert step[1] > 0
    restored = inverse_scene(centered, rotation, center)
    assert restored == pytest.approx(xy, abs=1e-9)


def test_writer_roundtrip(tmp_path):
    row = TrackRow(12, 7, 1.23456, -2.0, 1, 3)
    line = writers.trajnet(row)
    import json

    parsed = json.loads(line)
    assert parsed["track"]["x"] == 1.23
    assert parsed["track"]["prediction_number"] == 1


def test_pack_scenes_and_masks():
    s1 = np.full((21, 3, 2), NAN)
    s1[:, 0] = 1.0
    s1[5:, 1] = 2.0
    s1[:10, 2] = 3.0
    s2 = np.ones((21, 1, 2))
    packed = pack_scenes([s1, s2], pad_scenes_to=4)
    assert packed.xy.shape == (21, 4, 4, 2)
    assert packed.mask.shape == (21, 4, 4)
    assert packed.num_agents.tolist() == [3, 1, 0, 0]
    assert packed.mask[0, 0].tolist() == [True, False, True, False]
    assert packed.mask[:, 2].sum() == 0  # padding scene fully masked
    # roundtrip
    restored = unpack_scene(packed, 0)
    assert restored == pytest.approx(s1, nan_ok=True)


def test_nan_mask_roundtrip():
    xy = np.array([[[1.0, 2.0], [NAN, NAN]]])
    vals, mask = nan_to_mask(xy)
    assert vals[0, 1].tolist() == [0.0, 0.0]
    assert mask_to_nan(vals, mask) == pytest.approx(xy, nan_ok=True)


def test_agent_bucket():
    assert agent_bucket(1) == 4
    assert agent_bucket(4) == 4
    assert agent_bucket(5) == 8
    assert agent_bucket(200) == 128


def test_pack_scenes_never_silently_truncates():
    # default bucketing grows past the largest bucket to fit every agent
    big = np.ones((21, 150, 2))
    packed = pack_scenes([big])
    assert packed.max_agents == 150
    assert packed.num_agents.tolist() == [150]
    # an explicit bucket truncates, but loudly
    with pytest.warns(UserWarning, match="truncating"):
        packed = pack_scenes([big], bucket=128)
    assert packed.num_agents.tolist() == [128]


def test_batch_iterator_pads_final_batch():
    scenes = [np.ones((21, 2, 2)) for _ in range(5)]
    batches = list(batch_iterator(scenes, None, batch_size=2))
    assert len(batches) == 3
    assert all(b.num_scenes == 2 for b in batches)
    assert batches[-1].num_agents.tolist() == [2, 0]


def test_add_noise_bounds():
    xy = np.zeros((21, 3, 2))
    out = add_noise(xy.copy(), thresh=0.01, ped="neigh")
    assert np.all(out[:, 0] == 0)  # primary untouched
    assert np.all(np.abs(out[:9, 1:]) <= 0.01)
    assert np.any(out[:9, 1:] != 0)


def test_reader_scene_options(tmp_path):
    root = make_synthetic_dataset(str(tmp_path))
    reader = Reader(os.path.join(root, "train", "synth.ndjson"), scene_type="paths")
    assert len(list(reader.scenes(limit=2))) == 2
    assert [sid for sid, _ in reader.scenes(ids=[3, 1])] == [3, 1]
    import random as _r

    _r.seed(0)
    assert len(list(reader.scenes(sample=0.5))) == 2
    rows_reader = Reader(os.path.join(root, "train", "synth.ndjson"), scene_type="rows")
    sid, rows = rows_reader.scene(0)
    assert all(hasattr(r, "frame") for r in rows)
