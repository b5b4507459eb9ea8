from . import mesh, sharded_matvec  # noqa: F401
