from . import cameras, gaussians, quaternions, sh  # noqa: F401
