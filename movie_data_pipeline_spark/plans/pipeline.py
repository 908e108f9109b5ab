"""End-to-end MovieLens ETL (reference ``main()``, ``etl.py:324-340``)
as one lazy Spark DAG per output table — no row-at-a-time anything.

Stages (SURVEY §3.1 mapping):
  read movies CSV → year extraction → enrichment join (staged lookup,
  default-stubbed) → title clean → cleaners → movies table
  read movies CSV → genre explode → genre dim + movie_genres pairs
  read ratings CSV → rename → surrogate id → ratings table

Returns DataFrames (callers write them via sinks.py or register as
views); the transform graph is pure and testable without I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaners import clean_box_office, clean_runtime
from ..functions.titles import full_title_clean
from ..operators.genres import build_genre_dim, build_movie_genres, explode_genres
from ..sources import enrichment
from ..sources.movielens import read_movies_csv, read_ratings_csv


def build_movies_table(
    spark: SparkSession, movies_csv: str, lookup: DataFrame | None = None
) -> DataFrame:
    """movies table (schema.sql:4-15 semantics, affinity quirks fixed)."""
    raw = read_movies_csv(spark, movies_csv)
    if lookup is None:
        lookup = enrichment.stub_lookup(spark)
    enriched = enrichment.enrich(raw, lookup)
    return enriched.select(
        F.col("movieId").alias("movie_id"),
        full_title_clean(F.col("title")).alias("title"),
        F.col("release_year"),
        F.col("imdb_id"),
        F.col("plot"),
        F.col("director"),
        clean_box_office(F.col("box_office")).alias("box_office_dollars"),
        clean_runtime(F.col("runtime")).alias("runtime_mins"),
        F.col("imdb_rating"),
        F.current_timestamp().alias("created_at"),
    )


def build_genre_tables(
    spark: SparkSession, movies_csv: str
) -> tuple[DataFrame, DataFrame]:
    """(genres dim, movie_genres pairs)."""
    raw = read_movies_csv(spark, movies_csv)
    pairs = explode_genres(raw)
    dim = build_genre_dim(pairs)
    return dim, build_movie_genres(pairs, dim)


def build_ratings_table(spark: SparkSession, ratings_csv: str) -> DataFrame:
    """ratings with a surrogate id. ``monotonically_increasing_id`` is
    non-dense by design (SURVEY §4.3.3 — rating_id appears in no query;
    dense ids would force a global sort at 100 M+ rows)."""
    return read_ratings_csv(spark, ratings_csv).select(
        F.monotonically_increasing_id().alias("rating_id"),
        "movie_id",
        "user_id",
        "rating",
        "timestamp",
    )


def validate_ratings(ratings: DataFrame) -> DataFrame:
    """CHECK(rating BETWEEN 0 AND 5) (schema.sql:37) as a write-time
    validation filter (SURVEY §1.4 — no constraint enforcement in
    DataFrames)."""
    return ratings.filter((F.col("rating") >= 0) & (F.col("rating") <= 5))


def run_movielens_etl(
    spark: SparkSession,
    movies_csv: str,
    ratings_csv: str,
    lookup: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The full pipeline; returns the four canonical tables."""
    movies = build_movies_table(spark, movies_csv, lookup)
    genre_dim, movie_genres = build_genre_tables(spark, movies_csv)
    ratings = validate_ratings(build_ratings_table(spark, ratings_csv))
    return {
        "movies": movies,
        "genres": genre_dim,
        "movie_genres": movie_genres,
        "ratings": ratings,
    }


def load_movielens(
    spark: SparkSession,
    movies_csv: str,
    ratings_csv: str,
    root: str,
    lookup: DataFrame | None = None,
    keep_versions: int = 1,
) -> int:
    """The reference's transactional load (``etl.py:236-276``: all
    four tables under one SQLite transaction, rollback on failure) as
    a materialized ETL run: build every table, then publish them as
    ONE atomic snapshot (``sources/snapshot.py`` manifest-pointer
    commit). A failure anywhere before the pointer swap leaves the
    previous snapshot — all four tables — fully readable; there is no
    state in which a reader sees a partial load. Returns the committed
    snapshot version."""
    from ..sources.snapshot import publish_snapshot

    return publish_snapshot(
        root,
        run_movielens_etl(spark, movies_csv, ratings_csv, lookup),
        keep_versions=keep_versions,
    )
