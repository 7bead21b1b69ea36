from . import cameras, lie  # noqa: F401
