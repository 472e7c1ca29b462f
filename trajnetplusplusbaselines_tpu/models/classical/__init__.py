from . import constant_velocity

__all__ = ["constant_velocity"]
