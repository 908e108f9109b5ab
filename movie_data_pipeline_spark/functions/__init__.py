from . import cleaners, text, titles, vectors  # noqa: F401
