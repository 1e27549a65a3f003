from . import cones, linop, prox, riccati  # noqa: F401
