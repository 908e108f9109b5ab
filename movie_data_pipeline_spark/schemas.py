"""Explicit schemas — the engine never relies on runtime inference.

Input schemas mirror the reference's CSV inputs (reference
``movies.csv:1``, ``ratings.csv:1``); output schemas mirror the 4-table
normalized model (reference ``schema.sql:4-40``) with the type-affinity
quirks fixed (SURVEY.md §1.2): ``release_year`` is a real INT (the
reference stores TEXT), ``box_office_dollars`` is a real LONG with
"N/A" mapped to NULL at clean time.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- raw inputs (MovieLens small CSVs) ----

MOVIES_RAW = T.StructType(
    [
        T.StructField("movieId", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("genres", T.StringType(), True),
    ]
)

RATINGS_RAW = T.StructType(
    [
        T.StructField("userId", T.LongType(), False),
        T.StructField("movieId", T.LongType(), False),
        T.StructField("rating", T.DoubleType(), False),
        T.StructField("timestamp", T.LongType(), False),
    ]
)

# ---- enrichment lookup (flattened OMDb response, reference etl.py:135-145) ----

OMDB_LOOKUP = T.StructType(
    [
        T.StructField("lookup_title", T.StringType(), False),
        T.StructField("lookup_year", T.IntegerType(), True),
        T.StructField("imdb_id", T.StringType(), True),
        T.StructField("plot", T.StringType(), True),
        T.StructField("director", T.StringType(), True),
        T.StructField("box_office", T.StringType(), True),
        T.StructField("runtime", T.StringType(), True),
        T.StructField("imdb_rating", T.DoubleType(), True),
    ]
)

# ---- canonical at-rest tables (reference schema.sql:4-40, affinity-fixed) ----

MOVIES = T.StructType(
    [
        T.StructField("movie_id", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("release_year", T.IntegerType(), True),
        T.StructField("imdb_id", T.StringType(), True),
        T.StructField("plot", T.StringType(), True),
        T.StructField("director", T.StringType(), True),
        T.StructField("box_office_dollars", T.LongType(), True),
        T.StructField("runtime_mins", T.IntegerType(), True),
        T.StructField("imdb_rating", T.DoubleType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

GENRES = T.StructType(
    [
        T.StructField("genre_id", T.LongType(), False),
        T.StructField("genre_name", T.StringType(), False),
    ]
)

MOVIE_GENRES = T.StructType(
    [
        T.StructField("movie_id", T.LongType(), False),
        T.StructField("genre_id", T.LongType(), False),
    ]
)

RATINGS = T.StructType(
    [
        T.StructField("rating_id", T.LongType(), False),
        T.StructField("movie_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("rating", T.DoubleType(), False),
        T.StructField("timestamp", T.LongType(), False),
    ]
)

# The driver's synthetic corpus (TESTDATA.md) table names.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
