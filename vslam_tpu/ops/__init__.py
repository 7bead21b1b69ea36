from . import describe, detect, hamming, pattern  # noqa: F401
