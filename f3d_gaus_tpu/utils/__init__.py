from . import profiling, logging  # noqa: F401
