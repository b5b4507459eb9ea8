from . import diagnostics, nuts, smc, vi  # noqa: F401
