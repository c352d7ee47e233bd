from . import cloth_pallas, cloth_pallas_tiled, raster_pallas

__all__ = ["cloth_pallas", "cloth_pallas_tiled", "raster_pallas"]
