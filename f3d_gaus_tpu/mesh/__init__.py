from . import tetra, points, delaunay, extract  # noqa: F401
