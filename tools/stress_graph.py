"""Scale stress for the graph family: build a K× orders+lineitem
warehouse from sf0.1 as K DISJOINT key-shifted copies (graph nodes and
edges both grow K×, with no cross-copy edges), then time each graph
operator at 1× and K×.

The growth CURVE is the claim under test: triangle counting is a
fixed 3-join dataflow over the sparsified co-shipment graph, k-core /
PageRank / HITS are per-round linear in surviving |E| with a bounded
round count, so all should grow ≈linearly in graph size with flat
driver memory (the driver only ever sees 1-row aggregates). Run:

    python tools/stress_graph.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.plans.graphs import (  # noqa: E402
    supplier_cotrade_triangles,
    trade_hits,
    trade_kcore,
    trade_pagerank,
)
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def timed(label: str, build) -> float:
    t0 = time.perf_counter()
    n = build().count()
    dt = time.perf_counter() - t0
    print(f"  {label:28s} {dt:7.2f}s  ({n} result rows)")
    return dt


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress_graph")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    mo = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    mc = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    ms = li.agg(F.max("l_suppkey")).collect()[0][0] + 1

    copies = F.broadcast(spark.range(k).select(F.col("id").alias("copy")))
    big = "/tmp/stress_graph_warehouse"
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * mo).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("copy") * mc).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(big + "/orders.parquet")
    )
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * mo).alias("l_orderkey"),
            "l_partkey",
            (F.col("l_suppkey") + F.col("copy") * ms).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
        .write.mode("overwrite")
        .parquet(big + "/lineitem.parquet")
    )
    print(f"warehouse: orders/lineitem replicated {k}x (disjoint keys)\n")

    # warm-up: JVM, codegen, shuffle service
    supplier_cotrade_triangles(spark, SF_DIR).count()
    clear_state(spark)

    ops = [
        ("supplier_cotrade_triangles", supplier_cotrade_triangles),
        ("trade_kcore", trade_kcore),
        ("trade_pagerank", trade_pagerank),
        ("trade_hits", trade_hits),
    ]
    results: dict[str, list[float]] = {}
    for label, sf_dir in [("1x", SF_DIR), (f"{k}x", big)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        for name, fn in ops:
            dt = timed(name, lambda fn=fn, d=sf_dir: fn(spark, d))
            results.setdefault(name, [0.0, 0.0])[label != "1x"] = dt
            clear_state(spark)
        print()

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':28s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:28s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    main()
