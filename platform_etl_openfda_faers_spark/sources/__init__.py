from . import readers, writers  # noqa: F401
