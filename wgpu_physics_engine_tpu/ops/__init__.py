from . import cloth_pallas

__all__ = ["cloth_pallas"]
