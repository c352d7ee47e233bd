from . import broadphase, cloth, granular, oracle, particles, scenes

__all__ = ["broadphase", "cloth", "granular", "oracle", "particles", "scenes"]
