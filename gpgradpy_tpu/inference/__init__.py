from . import nuts, smc, vi  # noqa: F401
