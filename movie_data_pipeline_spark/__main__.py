"""CLI — the reference's two entry points (`python etl.py` and
`sqlite3 movies.db < queries.sql`, SURVEY §3.1/§3.3), Spark-native:

  python -m movie_data_pipeline_spark etl [--movies CSV] [--ratings CSV]
      [--warehouse DIR]
      run the full MovieLens ETL, write the 4 canonical tables as
      parquet, print table stats (reference print_stats, etl.py:279-293)

  python -m movie_data_pipeline_spark queries [--warehouse DIR]
      run the 4 canonical analytical queries against the warehouse and
      print TSV (reference run_queries, etl.py:295-321)

  python -m movie_data_pipeline_spark sql FILE [--warehouse DIR]
      run an arbitrary ;-separated SQL script against the warehouse
      views (quote-aware splitting — fixes etl.py:304)

Enrichment uses the deterministic stub lookup by default (the
network-free model of the OMDb source, SURVEY §2.1 S3); pass
--lookup PARQUET to supply a real staged lookup table.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession

REF_DIR = "/root/reference"
CANONICAL_TABLES = ("movies", "genres", "movie_genres", "ratings")


def _spark() -> SparkSession:
    from .session import get_spark

    return get_spark("movie_data_pipeline_spark-cli")


def _register_warehouse(spark: SparkSession, warehouse: str) -> None:
    """Resolve tables through the snapshot manifest when one exists
    (atomic-publish layout); fall back to the flat per-table layout
    for warehouses written before the manifest existed."""
    from .sources import snapshot

    manifest = snapshot.read_manifest(warehouse)
    for t in CANONICAL_TABLES:
        df = (
            snapshot.read_snapshot_table(spark, warehouse, t)
            if manifest
            else spark.read.parquet(os.path.join(warehouse, t))
        )
        df.createOrReplaceTempView(t)


def cmd_etl(args: argparse.Namespace) -> int:
    from .plans.pipeline import load_movielens
    from .sources.sinks import table_stats

    spark = _spark()
    lookup = (
        spark.read.parquet(args.lookup) if args.lookup else None
    )
    # one atomic publish for all four tables — the reference's single
    # SQLite transaction (etl.py:236-276): a failed run leaves any
    # previous warehouse snapshot fully intact
    load_movielens(spark, args.movies, args.ratings, args.warehouse, lookup)
    _register_warehouse(spark, args.warehouse)
    stats = table_stats(
        spark, {t: spark.table(t) for t in CANONICAL_TABLES}
    )
    enriched = spark.table("movies").filter("imdb_id IS NOT NULL").count()
    print("=== table stats ===")
    for name, n in stats.items():
        print(f"{name}\t{n}")
    print(f"movies enriched\t{enriched}")
    return 0


def cmd_queries(args: argparse.Namespace) -> int:
    from .plans import movie_queries as MQ
    from .sources.sql_runner import run_script

    spark = _spark()
    _register_warehouse(spark, args.warehouse)
    script = ";\n".join([MQ.Q1_SQL, MQ.Q2_SQL, MQ.Q3_SQL_SPARK, MQ.Q4_SQL])
    run_script(spark, script, print_results=True)
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    from .sources.sql_runner import run_script

    spark = _spark()
    _register_warehouse(spark, args.warehouse)
    with open(args.file) as fh:
        run_script(spark, fh.read(), print_results=True)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="movie_data_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_etl = sub.add_parser("etl", help="run the MovieLens ETL")
    p_etl.add_argument("--movies", default=f"{REF_DIR}/movies.csv")
    p_etl.add_argument("--ratings", default=f"{REF_DIR}/ratings.csv")
    p_etl.add_argument("--warehouse", default="spark-warehouse/movielens")
    p_etl.add_argument("--lookup", default=None,
                       help="staged OMDb-shaped lookup parquet")
    p_etl.set_defaults(fn=cmd_etl)

    p_q = sub.add_parser("queries", help="run the 4 canonical queries")
    p_q.add_argument("--warehouse", default="spark-warehouse/movielens")
    p_q.set_defaults(fn=cmd_queries)

    p_sql = sub.add_parser("sql", help="run a SQL script file")
    p_sql.add_argument("file")
    p_sql.add_argument("--warehouse", default="spark-warehouse/movielens")
    p_sql.set_defaults(fn=cmd_sql)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
