"""MovieLens CSV sources (reference S1/S2, SURVEY.md §2.1).

Explicit schemas instead of inference (deterministic, and lets the
parquet/CSV reader prune + push down). Year extraction (F9) happens at
scan time, as in the reference (``etl.py:161-162``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..functions.titles import extract_release_year


def read_movies_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: movies.csv → (movieId, title, genres, release_year).

    ``quote``/``escape`` defaults already handle the reference CSV's
    quoted titles containing commas ("American President, The (1995)").
    """
    df = spark.read.csv(path, header=True, schema=schemas.MOVIES_RAW)
    return df.withColumn("release_year", extract_release_year(F.col("title")))


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: ratings.csv with the reference's P1 renames applied."""
    df = spark.read.csv(path, header=True, schema=schemas.RATINGS_RAW)
    return df.withColumnRenamed("userId", "user_id").withColumnRenamed(
        "movieId", "movie_id"
    )
