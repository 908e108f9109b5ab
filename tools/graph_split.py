"""Measure the derivation-vs-iteration split of the trade-graph
family (r7 verdict item 2): how much of each fixpoint query's wall was
the orders ⋈ lineitem edge derivation the memo now pays once.

Times (1) the cold materialization of the weighted pairs memo, then
(2) each graph registry entry with the memo warm — so the per-query
walls are pure iteration + read. The pre-memo per-query cost was
approximately (2) + one derivation each.

Usage: python tools/graph_split.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from movie_data_pipeline_spark.plans import graphs as G  # noqa: E402
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("graph_split")

    # generic warm-up: JVM, codegen, parquet footers — on an entry that
    # does NOT touch the memo, so the derivation timing below is cold
    from movie_data_pipeline_spark.plans.analytics import QUERIES

    q, _ = QUERIES["q2_top_regions"]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    G._trade_pairs_weighted(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t_derive = time.perf_counter() - t0
    print(f"derivation (cold materialize + read): {t_derive:.2f}s")
    clear_state(spark)

    names = [
        "trade_pagerank", "trade_pagerank_weighted", "trade_ppr_nation0",
        "trade_hits", "trade_kcore",
    ]
    total = 0.0
    for name in names:
        builder, _ = QUERIES[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            clear_state(spark)
        total += best
        print(f"{name:28s} memo-warm min-of-{reps}: {best:6.2f}s")
    print(f"family total (memo-warm): {total:.2f}s "
          f"(+ {t_derive:.2f}s derivation paid ONCE, was ~once per query)")


if __name__ == "__main__":
    main()
