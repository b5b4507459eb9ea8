from . import assembly, conditioning, likelihood, mean  # noqa: F401
