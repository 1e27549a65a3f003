from . import anderson, common, cp, supermann  # noqa: F401
