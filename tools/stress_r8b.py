"""Scale stress for the late-round-8 families (ext7/ext8/ext9): K×
documents/embeddings/events via the stress_r7 warehouse, plus K×
orders/lineitem/part built here by key-shifted disjoint copies (new
customers/orders/parts each copy, same per-customer basket shapes —
so per-key work is constant and only the key population grows).

What each curve must show:

1. ``part_affinity_cosine`` — the within-customer pair expansion is
   quadratic PER BASKET but baskets don't grow with K (copies add
   customers, not basket depth), so the honest expectation is
   ≈linear. A superlinear curve would mean the expansion leaks
   across customers.
2. ``trade_bfs_hops`` — K disjoint graph copies, seed in one of
   them: frontier size is constant, edge relation is K× ⇒ the
   per-round hash join grows ≈linearly.
3. ``part_price_skyline`` — bucket-local dominance pruning: the
   phase-2 input stays ≤ buckets×|distinct sizes| regardless of K.
4. ``part_name_fuzzy_pairs`` — the name VOCABULARY doesn't grow
   with K, so the curve should be ≈flat (the distinct() collapses
   K× rows to the same 64 names; only the scan grows).
5. ``token_pmi_bigrams`` / ``token_entropy_by_lang`` — explode →
   map-side-combinable counts ⇒ ≈linear.
6. ``value_acf_by_type`` / ``value_cusum_changepoint`` /
   ``customer_spend_gini`` — day-bounded windows / calendar-bounded
   windows / bucket-decomposed rank ⇒ ≈linear, no single-reducer
   blowup.
7. ``hybrid_search_rrf`` / ``ranking_rbo`` — corpus-sized work is
   the two retrieval scans; fusion stays ≤2k rows ⇒ ≈linear.

Driver max-RSS printed alongside (must stay flat). Run:

    python tools/stress_r8b.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402
from tools.stress_r7 import SF_DIR, build_warehouse  # noqa: E402

TMP = "/tmp/stress_r8b"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_sales_warehouse(spark, k: int) -> str:
    """K× orders/lineitem/part (and 1× supplier — the BFS seed side)
    by key-shifted disjoint copies under TMP."""
    copies = F.broadcast(spark.range(k).select(F.col("id").alias("copy")))

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    mo = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    mc = orders.agg(F.max("o_custkey")).collect()[0][0] + 1
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * mo).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("copy") * mc).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        )
        .write.mode("overwrite")
        .parquet(f"{TMP}/orders.parquet")
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    mp = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * mo).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("copy") * mp).alias("l_partkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
        )
        .write.mode("overwrite")
        .parquet(f"{TMP}/lineitem.parquet")
    )
    (
        part.crossJoin(copies)
        .select(
            (F.col("p_partkey") + F.col("copy") * mp).alias("p_partkey"),
            *[c for c in part.columns if c != "p_partkey"],
        )
        .write.mode("overwrite")
        .parquet(f"{TMP}/part.parquet")
    )
    # supplier stays 1× (the BFS seed relation); copy it through so
    # load_table resolves
    spark.read.parquet(f"{SF_DIR}/supplier.parquet").write.mode(
        "overwrite"
    ).parquet(f"{TMP}/supplier.parquet")
    return TMP


def link_docs_warehouse(docs_dir: str) -> None:
    """The ext7/8 doc/embedding/event entries read from the same
    sf_dir as the sales tables — symlink the stress_r7 outputs in."""
    for t in ("documents", "embeddings", "events"):
        dst = Path(TMP) / f"{t}.parquet"
        if not dst.exists():
            dst.symlink_to(Path(docs_dir) / f"{t}.parquet")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r8b")
    docs_big = build_warehouse(spark, k)
    build_sales_warehouse(spark, k)
    link_docs_warehouse(docs_big)
    print(f"warehouse: docs/emb/events + orders/lineitem/part at {k}x\n")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics import QUERIES

    names = [
        "part_affinity_cosine", "trade_bfs_hops", "part_price_skyline",
        "part_name_fuzzy_pairs", "token_pmi_bigrams",
        "token_entropy_by_lang", "value_acf_by_type",
        "value_cusum_changepoint", "customer_spend_gini",
        "hybrid_search_rrf", "ranking_rbo",
    ]
    results: dict[str, list[float]] = {}
    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", TMP, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        for name in names:
            builder, _ = QUERIES[name]
            t0 = time.perf_counter()
            n = builder(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            results.setdefault(name, [0.0, 0.0])[idx] = dt
            print(f"  {name:28s} {dt:7.2f}s  ({n} rows)")
            clear_state(spark)
        print()

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':28s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:28s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    main()
