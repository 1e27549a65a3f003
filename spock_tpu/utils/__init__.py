from . import refvec  # noqa: F401
