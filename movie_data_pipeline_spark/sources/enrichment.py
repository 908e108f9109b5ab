"""Enrichment source: the OMDb lookup re-expressed as a join (J4/S3).

The reference does a per-movie HTTP cascade (``etl.py:116-152``): for
each title candidate (priority-ordered), try (candidate, year) then
(candidate, no-year); first hit wins; total miss → default record.

Spark-first model (SURVEY §2.3 J4): enrichment is a STAGED LOOKUP TABLE
(offline-fetched or synthetic, schema ``schemas.OMDB_LOOKUP``) and the
cascade becomes an ordered-fallback ("priority") join:

    explode candidates with their priority index
      → join lookup on (candidate, year) and on (candidate, NULL-year)
      → row_number() over (movie) ordered by (candidate priority,
        with-year-before-without) → keep rank 1
      → left join back to movies → coalesce defaults for misses.

This is deterministic, testable, and fully distributed — the network
concern is isolated in ``fetch_lookup_batch`` (a ``mapInPandas``
builder for live fetching, stubbed offline by default).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.titles import generate_title_candidates

DEFAULTS = {
    "imdb_id": None,
    "plot": "Not Available",
    "director": "Unknown",
    "box_office": None,
    "runtime": None,
    "imdb_rating": None,
}

_LOOKUP_COLS = ["imdb_id", "plot", "director", "box_office", "runtime", "imdb_rating"]


def with_candidates(movies: DataFrame, title_col: str = "title") -> DataFrame:
    """Attach the priority-ordered candidate array (F7) to each movie."""
    return movies.withColumn("title_candidates", generate_title_candidates(F.col(title_col)))


def enrich(movies: DataFrame, lookup: DataFrame) -> DataFrame:
    """Ordered-fallback enrichment join.

    ``movies`` must carry ``movieId``, ``title``, ``release_year``.
    ``lookup`` has schema ``schemas.OMDB_LOOKUP``; a row with
    ``lookup_year IS NULL`` matches the reference's without-year probe.

    At reference scale the lookup is broadcast; at 100 TB scale both
    sides shuffle on the candidate key — the plan is the same shape
    either way and contains exactly one wide join + one window.
    """
    cand = (
        with_candidates(movies)
        .select(
            "movieId",
            "release_year",
            F.posexplode("title_candidates").alias("cand_priority", "cand_title"),
        )
    )

    # One probe row per (candidate, with_year? yes/no), mirroring the
    # reference's params_list order: with-year first when year known.
    probes = cand.select(
        "movieId",
        "cand_priority",
        "cand_title",
        F.explode(
            F.when(
                F.col("release_year").isNotNull(),
                F.array(F.col("release_year"), F.lit(None).cast("int")),
            ).otherwise(F.array(F.lit(None).cast("int")))
        ).alias("probe_year"),
    ).withColumn(
        "probe_priority",
        F.when(F.col("probe_year").isNotNull(), F.lit(0)).otherwise(F.lit(1)),
    )

    joined = probes.join(
        F.broadcast(lookup),
        (probes.cand_title == lookup.lookup_title)
        & (
            (probes.probe_year.isNull() & lookup.lookup_year.isNull())
            | (probes.probe_year == lookup.lookup_year)
        ),
        "inner",
    )

    w = Window.partitionBy("movieId").orderBy("cand_priority", "probe_priority")
    best = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("movieId", *_LOOKUP_COLS)
    )

    out = movies.join(best, "movieId", "left")
    # F12 defaults on miss.
    out = out.withColumn("plot", F.coalesce("plot", F.lit(DEFAULTS["plot"])))
    out = out.withColumn("director", F.coalesce("director", F.lit(DEFAULTS["director"])))
    return out


def stub_lookup(spark) -> DataFrame:
    """Empty lookup table → every movie gets the default record, the
    exact behavior of the survey's API-stubbed golden run."""
    from .. import schemas

    return spark.createDataFrame([], schemas.OMDB_LOOKUP)


def fetch_lookup_batch(api_key: str, base_url: str = "https://www.omdbapi.com/"):
    """Builder for a live-fetch ``mapInPandas`` function (S3).

    Returns a function suitable for
    ``candidates_df.mapInPandas(fn, schema=OMDB_LOOKUP)`` where
    ``candidates_df`` has columns (cand_title, probe_year). Retries and
    pacing are partition-local (reference etl.py:29-30,131). Offline by
    default — network access is the caller's explicit choice.
    """

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        import requests

        for pdf in batches:
            rows = []
            for title, year in zip(pdf["cand_title"], pdf["probe_year"]):
                params = {"apikey": api_key, "type": "movie", "t": title}
                if pd.notna(year):
                    params["y"] = int(year)
                rec = None
                for _ in range(2):  # API_RETRIES
                    try:
                        r = requests.get(base_url, params=params, timeout=10)
                        r.raise_for_status()
                        data = r.json()
                        if data.get("Response") == "True":
                            rating = data.get("imdbRating")
                            rec = {
                                "lookup_title": title,
                                "lookup_year": int(year) if pd.notna(year) else None,
                                "imdb_id": data.get("imdbID"),
                                "plot": data.get("Plot") or "Not Available",
                                "director": data.get("Director") or "Unknown",
                                "box_office": data.get("BoxOffice"),
                                "runtime": data.get("Runtime"),
                                "imdb_rating": float(rating)
                                if rating not in (None, "N/A")
                                else None,
                            }
                        break
                    except requests.RequestException:
                        time.sleep(1)
                if rec:
                    rows.append(rec)
                time.sleep(0.5)  # REQUEST_DELAY, partition-local pacing
            yield pd.DataFrame(
                rows,
                columns=[
                    "lookup_title",
                    "lookup_year",
                    "imdb_id",
                    "plot",
                    "director",
                    "box_office",
                    "runtime",
                    "imdb_rating",
                ],
            )

    return fetch
