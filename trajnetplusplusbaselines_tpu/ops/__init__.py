from . import core
from . import embeddings
from . import pooling

__all__ = ["core", "embeddings", "pooling"]
