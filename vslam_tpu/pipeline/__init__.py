from . import ba_window, keyframe, slam, tracking  # noqa: F401
