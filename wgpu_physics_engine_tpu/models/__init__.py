from . import cloth, oracle, particles

__all__ = ["cloth", "oracle", "particles"]
