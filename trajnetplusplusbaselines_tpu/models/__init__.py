from . import lstm

__all__ = ["lstm"]
