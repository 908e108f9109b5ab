from . import analytics, movie_queries, pipeline  # noqa: F401
