"""Genre normalization pipeline (reference E1 + P2/P3 + D1, transform
stage ``etl.py:186-200``) — the split/explode/filter/dim-build chain.

Reference semantics: split 'genres' on '|', trim each element, drop
empties and the '(no genres listed)' sentinel; distinct genre names get
dense ids; (movie_id, genre_id) pairs are deduped.

Scale note (SURVEY §4.3.3): dense ids via row_number over a global
window is a single-partition sort — fine for a 19-row dim, and the dim
is by construction tiny (distinct genre vocabulary), so this is safe at
any fact-table scale. The FACT side (pairs) never passes through a
global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SENTINEL = "(no genres listed)"


def explode_genres(movies_raw: DataFrame) -> DataFrame:
    """E1: one (movie_id, genre_name) row per genre of each movie."""
    return (
        movies_raw.filter(F.col("genres").isNotNull())  # P2
        .select(
            F.col("movieId").alias("movie_id"),
            F.explode(F.split("genres", r"\|")).alias("genre_name"),
        )
        .withColumn("genre_name", F.trim("genre_name"))
        .filter((F.col("genre_name") != "") & (F.col("genre_name") != SENTINEL))  # P3
    )


def build_genre_dim(pairs: DataFrame) -> DataFrame:
    """D1 + dense ids: distinct genre_name → (genre_id, genre_name).

    Ids are assigned in genre_name order (deterministic; the reference's
    first-appearance order depends on scan order, which has no stable
    Spark analogue — documented divergence, ids are join-internal only).
    """
    from .ranks import constant_partition_key

    # ≤19-genre dim; deliberately single-partition (warning-free)
    w = Window.partitionBy(constant_partition_key("genre_name")).orderBy(
        "genre_name"
    )
    return (
        pairs.select("genre_name")
        .distinct()
        .withColumn("genre_id", F.row_number().over(w).cast("long"))
        .select("genre_id", "genre_name")
    )


def build_movie_genres(pairs: DataFrame, genre_dim: DataFrame) -> DataFrame:
    """J3 + S7: map names → ids via broadcast join; dedupe the pair key."""
    return (
        pairs.join(F.broadcast(genre_dim), "genre_name")
        .select("movie_id", "genre_id")
        .dropDuplicates(["movie_id", "genre_id"])
    )
