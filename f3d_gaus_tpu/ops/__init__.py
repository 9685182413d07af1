from . import binning, rasterize, rasterize_ref  # noqa: F401
from .rasterize import render  # noqa: F401
