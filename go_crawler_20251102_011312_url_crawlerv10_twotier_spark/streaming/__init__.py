from . import feed  # noqa: F401
