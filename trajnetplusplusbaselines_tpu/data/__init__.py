from .rows import SceneRow, TrackRow
from .reader import Reader
from . import writers
from . import augmentation
from .augmentation import (
    add_noise,
    center_scene,
    drop_distant,
    drop_unobserved,
    inverse_scene,
    random_rotation,
    theta_rotation,
)
from .batching import (
    DEFAULT_AGENT_BUCKETS,
    PackedScenes,
    agent_bucket,
    batch_iterator,
    mask_to_nan,
    nan_to_mask,
    pack_scenes,
    unpack_scene,
)
from .load import prepare_data

__all__ = [
    "SceneRow",
    "TrackRow",
    "Reader",
    "writers",
    "augmentation",
    "add_noise",
    "center_scene",
    "drop_distant",
    "drop_unobserved",
    "inverse_scene",
    "random_rotation",
    "theta_rotation",
    "DEFAULT_AGENT_BUCKETS",
    "PackedScenes",
    "agent_bucket",
    "batch_iterator",
    "mask_to_nan",
    "nan_to_mask",
    "pack_scenes",
    "unpack_scene",
    "prepare_data",
]

from . import interactions  # noqa: E402

__all__.append("interactions")
