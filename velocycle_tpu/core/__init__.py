from . import constraints, distributions, handlers  # noqa: F401
