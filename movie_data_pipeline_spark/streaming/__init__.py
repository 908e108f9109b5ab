from . import docs, events  # noqa: F401
