from . import pages, tables  # noqa: F401
