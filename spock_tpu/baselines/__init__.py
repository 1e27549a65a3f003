from . import scipy_ref  # noqa: F401
