from . import history, lbfgs, lhs, multistart, scipy_driver  # noqa: F401
