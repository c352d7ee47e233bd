from . import cloth_pallas, raster_pallas

__all__ = ["cloth_pallas", "raster_pallas"]
