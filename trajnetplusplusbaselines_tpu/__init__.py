"""TPU-native TrajNet++ trajectory-forecasting framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capabilities of
``vita-epfl/trajnetplusplusbaselines`` (reference layout documented in SURVEY.md).
Ragged pedestrian scenes become padded, masked ``[time, scene, agent, 2]`` tensors;
the autoregressive LSTM step engine runs inside ``jax.lax.scan`` with dense masked
interaction pooling; scenes scale across chips via ``jax.sharding`` meshes.
"""

__version__ = "0.1.0"

from . import data
from . import metrics

__all__ = ["data", "metrics", "__version__"]


def __getattr__(name):
    # heavier subpackages (jax-importing) load lazily
    if name in ("models", "ops", "losses", "trainers", "evaluator", "parallel",
                "utils", "tools"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
