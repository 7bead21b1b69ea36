from . import calib, euroc, map_io  # noqa: F401
