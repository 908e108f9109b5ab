"""Scale stress for the round-6 incremental/recurrence/interval
families (r6 verdict, Missing #2):

1. ``delta_near_dup_pairs`` — the corpus grows K×, the DELTA BATCH
   stays fixed. The operator's whole claim is that the probe tracks
   the delta, not the corpus: the index is built once (corpus-linear,
   timed separately as ``index build``), and each probe touches only
   slim band keys plus matched candidates. Expect probe growth far
   below K× (band-key shuffle grows with the index, verify join with
   matches).
2. ``ewma_user_values`` / ``value_anomaly_flags`` — events grow K×
   as key-shifted user copies. One hash shuffle + a linear
   carried-state scan per partition ⇒ ≈linear.
3. ``order_window_shipments`` / ``purchase_window_events`` — the
   interval-join family over K× orders/lineitem/events. Bucketed
   equi-joins, no nested loop ⇒ ≈linear.

Driver max-RSS is printed alongside: every operator keeps state
executor-side, so it must stay flat. Run:

    python tools/stress_incremental.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.operators.dedup import (  # noqa: E402
    delta_near_dup_pairs,
    minhash_index,
)
from movie_data_pipeline_spark.plans.timeseries import (  # noqa: E402
    ewma_user_values,
    order_window_shipments,
    purchase_window_events,
    value_anomaly_flags,
)
from movie_data_pipeline_spark.session import clear_state, get_spark  # noqa: E402
from tools.stress_dedup import perturbed_copies  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TMP = "/tmp/stress_incremental"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def timed(label: str, build) -> float:
    t0 = time.perf_counter()
    n = build().count()
    dt = time.perf_counter() - t0
    print(f"  {label:28s} {dt:7.2f}s  ({n} result rows)")
    return dt


def build_events_warehouse(spark, k: int) -> str:
    """K disjoint key-shifted copies of events + orders + lineitem."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    me = ev.agg(F.max("event_id")).collect()[0][0] + 1
    mu = ev.agg(F.max("user_id")).collect()[0][0] + 1
    mo = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    copies = F.broadcast(spark.range(k).select(F.col("id").alias("copy")))
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * me).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("copy") * mu).alias("user_id"),
            "event_type", "value", "props",
        )
        .write.mode("overwrite").parquet(f"{TMP}/events.parquet")
    )
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("copy") * mo).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite").parquet(f"{TMP}/orders.parquet")
    )
    (
        li.withColumn("copy", F.explode(F.array(*[F.lit(i) for i in range(k)])))
        .select(
            (F.col("l_orderkey") + F.col("copy") * mo).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        )
        .write.mode("overwrite").parquet(f"{TMP}/lineitem.parquet")
    )
    return TMP


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress_incremental")

    # -- 1. incremental dedup: fixed delta, corpus 1x vs Kx ------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # lazy, NOT checkpointed: clear_state() between runs drops
    # checkpoint blocks, and a parquet re-read is cheap
    delta = docs.filter(F.col("doc_id") % 10 == 7)
    corpus_1x = docs.filter(F.col("doc_id") % 10 != 7)
    corpus_kx = perturbed_copies(corpus_1x, k)
    n_delta = delta.count()
    print(f"incremental dedup: fixed delta of {n_delta} docs, corpus 1x vs {k}x")
    probe_times = {}
    for label, corpus in [("1x", corpus_1x), (f"{k}x", corpus_kx)]:
        t0 = time.perf_counter()
        idx = minhash_index(corpus).localCheckpoint()
        n_idx = idx.count()
        t_build = time.perf_counter() - t0
        print(f"  index build {label:4s} ({n_idx} docs)   {t_build:7.2f}s")
        probe_times[label] = timed(
            f"delta probe {label}",
            lambda i=idx: delta_near_dup_pairs(
                i, delta, threshold=0.7, max_bucket=1000
            ),
        )
        clear_state(spark)
    r = probe_times[f"{k}x"] / probe_times["1x"]
    print(f"  probe ratio at {k}x corpus: {r:.1f}x "
          f"(claim: tracks delta, stays well under {k}x)\n")

    # -- 2+3. recurrences and interval joins over a Kx warehouse -------
    big = build_events_warehouse(spark, k)
    print(f"events warehouse: events/orders/lineitem replicated {k}x\n")
    ewma_user_values(spark, SF_DIR).count()  # warm-up
    clear_state(spark)
    ops = [
        ("ewma_user_values", ewma_user_values),
        ("value_anomaly_flags", value_anomaly_flags),
        ("order_window_shipments", order_window_shipments),
        ("purchase_window_events", purchase_window_events),
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
    print(f"{'delta probe (fixed delta)':28s} {probe_times['1x']:7.2f}s "
          f"{probe_times[f'{k}x']:7.2f}s {r:6.1f}x")
    for name, (t1, tk) in results.items():
        print(f"{name:28s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    main()
