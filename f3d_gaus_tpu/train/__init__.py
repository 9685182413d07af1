from . import losses, feedforward  # noqa: F401
