from . import vocabulary  # noqa: F401
