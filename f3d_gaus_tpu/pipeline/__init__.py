from . import config, dataset, renderer, cycle  # noqa: F401
