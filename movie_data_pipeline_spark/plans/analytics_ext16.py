"""Sixteenth registry batch (round 11): the NULLS FIRST oracle
contract, exercised for real.

``operators/ranks.py`` routes NULL order keys to a dedicated lowest
bucket (Spark's ascending NULLS FIRST default), and its docstring has
carried a contract note since round 10: a DuckDB oracle's plain window
defaults to NULLS LAST, so a nullable order column needs an explicit
``NULLS FIRST`` in its oracle SQL. Shipped testdata has no NULL order
keys anywhere, so that divergence had unit tests but no live oracle
row — this entry injects NULLs deterministically (every 7th order key
in a fixed slice) and hash-compares the FULL ranked output row-by-row
against a DuckDB window carrying the explicit ``NULLS FIRST``, proving
the contract end-to-end: NULL keys occupy the lowest ranks compactly,
ordered by the tiebreak, and every non-NULL rank continues after them.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranks import parallel_row_number
from ..sources.catalog import load_table


def null_key_order_ranks(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    s = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
    )
    ranked = parallel_row_number(s, "v", ["o_orderkey"], out_col="i")
    return ranked.select("o_orderkey", "v", "i").orderBy("i")


NULL_KEY_ORDER_RANKS_SQL = """
WITH s AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_totalprice END AS v
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
)
SELECT o_orderkey, v,
       ROW_NUMBER() OVER (ORDER BY v ASC NULLS FIRST, o_orderkey) AS i
FROM s
ORDER BY i
"""


EXT16_QUERIES = {
    "null_key_order_ranks": (null_key_order_ranks, NULL_KEY_ORDER_RANKS_SQL),
}
