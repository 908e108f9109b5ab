from . import dedup, genres, similarity, topk  # noqa: F401
