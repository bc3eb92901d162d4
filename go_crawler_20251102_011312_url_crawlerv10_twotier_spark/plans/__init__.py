from . import checkpoint, frontier  # noqa: F401
