from . import mesh, multiseq, sharded_ba  # noqa: F401
