from . import car, server_heat  # noqa: F401
