from . import constant_velocity
from . import kalman

__all__ = ["constant_velocity", "kalman", "orca", "socialforce"]


def __getattr__(name):
    # orca / socialforce import lazily (orca compiles native code on first use)
    if name in ("orca", "socialforce"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
