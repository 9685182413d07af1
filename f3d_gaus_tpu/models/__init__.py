from . import layers, songunet, predictor  # noqa: F401
