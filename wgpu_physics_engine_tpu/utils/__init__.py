from . import checkpoint, profiling, viewer

__all__ = ["checkpoint", "profiling", "viewer"]
