from . import ply  # noqa: F401
