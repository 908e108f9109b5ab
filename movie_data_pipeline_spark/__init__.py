"""movie_data_pipeline_spark — a PySpark-native analytics engine.

From-scratch reimplementation of the capabilities of the reference
pipeline ``Rsupraja-09082003/movie_data_pipeline`` (pandas + SQLite ETL
over MovieLens with OMDb enrichment + 4 analytical SQL queries),
re-expressed idiomatically on Spark DataFrames / Spark SQL / Catalyst,
and extended with the operators a large-scale training-data pipeline
needs (dedup, similarity search, text analysis, streaming).

Design stance (SURVEY.md §7.0):
- DataFrame / SQL declarative plans; let Catalyst optimize.
- Python only where unavoidable (diacritics UDF), always Arrow-vectorized.
- Every query exposed twice: DataFrame callable + ANSI SQL string.
- No driver-side collect on any data path; partition-parallel by design.
"""

__version__ = "0.1.0"
