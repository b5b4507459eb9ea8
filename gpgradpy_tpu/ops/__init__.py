from . import kernels, linalg, rtensor  # noqa: F401
