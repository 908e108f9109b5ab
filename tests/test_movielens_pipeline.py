"""End-to-end MovieLens ETL + the four canonical queries against the
reference's bundled data (API stubbed → default enrichment record),
pinned to the golden outputs verified in SURVEY.md §3.4 / FIXTURES.md §5.
"""

from __future__ import annotations

import pytest

from movie_data_pipeline_spark.plans import movie_queries as MQ
from movie_data_pipeline_spark.plans.pipeline import run_movielens_etl


@pytest.fixture(scope="module")
def tables(spark, movies_csv, ratings_csv):
    t = run_movielens_etl(spark, movies_csv, ratings_csv)
    for name, df in t.items():
        df.cache().createOrReplaceTempView(name)
    yield t
    for df in t.values():
        df.unpersist()


def test_cardinalities(tables):
    """FIXTURES.md §4 verified post-ETL counts."""
    assert tables["movies"].count() == 9742
    assert tables["genres"].count() == 19
    assert tables["movie_genres"].count() == 22050
    assert tables["ratings"].count() == 100836


def test_q1_highest_rated(tables):
    row = MQ.q1_highest_rated_movie(tables["movies"], tables["ratings"]).collect()[0]
    assert row["avg_rating"] == 5.0  # golden: any (5.0, max-count) movie
    assert row["rating_count"] >= 1


def test_q2_top_genres_golden(tables):
    rows = MQ.q2_top_genres(
        tables["genres"], tables["movie_genres"], tables["movies"], tables["ratings"]
    ).collect()
    got = [
        (r["genre_name"], r["avg_rating"], r["movie_count"], r["total_ratings"])
        for r in rows
    ]
    assert got == [
        ("Film-Noir", 3.92, 85, 870),
        ("War", 3.81, 381, 4859),
        ("Documentary", 3.8, 438, 1219),
        ("Drama", 3.66, 4349, 41928),   # Drama before Crime via total_ratings
        ("Crime", 3.66, 1196, 16681),
    ]


def test_q3_stubbed_director(tables):
    row = MQ.q3_most_prolific_director(tables["movies"]).collect()[0]
    assert row["director"] == "Unknown"  # stubbed enrichment
    assert row["movie_count"] == 9742


def test_q4_yearly_golden(tables):
    rows = MQ.q4_avg_rating_per_year(tables["movies"], tables["ratings"]).collect()
    assert len(rows) == 106
    assert rows[0]["release_year"] == 2018 and rows[-1]["release_year"] == 1902
    spot = {
        r["release_year"]: (r["avg_rating"], r["movie_count"], r["total_ratings"])
        for r in rows
    }
    assert spot[2018] == (3.48, 41, 91)
    assert spot[2017] == (3.58, 147, 461)
    assert spot[2016] == (3.39, 218, 785)


def test_queries_sql_surface(spark, tables):
    """The SQL twins must agree with the DataFrame plans (dual surface,
    SURVEY §3.3)."""
    pairs = [
        (MQ.q1_highest_rated_movie(tables["movies"], tables["ratings"]), MQ.Q1_SQL),
        (
            MQ.q2_top_genres(
                tables["genres"],
                tables["movie_genres"],
                tables["movies"],
                tables["ratings"],
            ),
            MQ.Q2_SQL,
        ),
        (MQ.q3_most_prolific_director(tables["movies"]), MQ.Q3_SQL_SPARK),
        (MQ.q4_avg_rating_per_year(tables["movies"], tables["ratings"]), MQ.Q4_SQL),
    ]
    for df, sql in pairs:
        got = sorted(map(tuple, df.collect()))
        via_sql = sorted(map(tuple, spark.sql(sql).collect()))
        assert got == via_sql


def test_movie_genres_no_sentinel(tables):
    assert (
        tables["genres"].filter("genre_name = '(no genres listed)'").count() == 0
    )


def test_ratings_check_constraint(tables):
    assert tables["ratings"].filter("rating < 0 OR rating > 5").count() == 0


def test_cli_etl_and_queries(spark, tmp_path, capsys, movies_csv, ratings_csv):
    """CLI wiring (argparse → pipeline → warehouse → SQL runner) on a
    trimmed corpus; the full-corpus golden run is covered above."""
    import itertools

    from movie_data_pipeline_spark.__main__ import main

    small_movies = tmp_path / "movies.csv"
    small_ratings = tmp_path / "ratings.csv"
    with open(movies_csv) as fh:
        small_movies.write_text("".join(itertools.islice(fh, 201)))
    with open(ratings_csv) as fh:
        small_ratings.write_text("".join(itertools.islice(fh, 1001)))
    wh = str(tmp_path / "wh")

    assert main([
        "etl", "--movies", str(small_movies),
        "--ratings", str(small_ratings), "--warehouse", wh,
    ]) == 0
    out = capsys.readouterr().out
    stats = dict(
        line.split("\t") for line in out.splitlines() if "\t" in line
    )
    assert stats["movies"] == "200"
    assert int(stats["movie_genres"]) > 200  # explode fans out
    assert stats["ratings"] == "1000"

    assert main(["queries", "--warehouse", wh]) == 0
    qout = capsys.readouterr().out
    # Q1 header + one result row; Q2 header present
    assert "title\trelease_year\tavg_rating\trating_count" in qout
    assert "genre_name\tavg_rating\tmovie_count\ttotal_ratings" in qout


def test_load_movielens_atomic_snapshot(spark, tmp_path, movies_csv, ratings_csv):
    """The transactional-load analogue end to end: one publish commits
    all four tables atomically; all are readable through the manifest
    with the golden cardinalities."""
    import itertools

    from movie_data_pipeline_spark.plans.pipeline import load_movielens
    from movie_data_pipeline_spark.sources import snapshot

    small_movies = tmp_path / "movies.csv"
    small_ratings = tmp_path / "ratings.csv"
    with open(movies_csv) as fh:
        small_movies.write_text("".join(itertools.islice(fh, 201)))
    with open(ratings_csv) as fh:
        small_ratings.write_text("".join(itertools.islice(fh, 1001)))
    root = str(tmp_path / "wh")

    assert load_movielens(spark, str(small_movies), str(small_ratings), root) == 1
    assert snapshot.snapshot_version(root) == 1
    counts = {
        name: snapshot.read_snapshot_table(spark, root, name).count()
        for name in ("movies", "genres", "movie_genres", "ratings")
    }
    assert counts["movies"] == 200
    assert counts["ratings"] == 1000
    assert counts["movie_genres"] > 200 and counts["genres"] > 5
    # a second load commits v2 and prunes v1
    assert load_movielens(spark, str(small_movies), str(small_ratings), root) == 2
    assert snapshot.read_snapshot_table(spark, root, "movies").count() == 200
