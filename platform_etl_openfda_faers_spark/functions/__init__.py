from . import normalize, stats, text, vectors  # noqa: F401
