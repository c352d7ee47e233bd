from . import cloth, oracle, particles, scenes

__all__ = ["cloth", "oracle", "particles", "scenes"]
