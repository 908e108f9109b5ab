from . import catalog, enrichment, movielens, sinks, sql_runner  # noqa: F401
