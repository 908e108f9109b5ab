"""Scale stress for the round-7 families (r7 verdict item 5): build a
K× warehouse under /tmp (documents via perturbed near-dup copies,
embeddings via perturbed near-neighbor copies, events via key-shifted
disjoint copies) and time each family at 1× vs K×.

What each curve must show:

1. ``containment_dedup_pairs`` (naive shared-shingle join) vs
   ``prefix_containment_pairs`` (prefix-filtered scale path). The
   naive join's candidate volume is Σ_s df(s)² — df grows ~K, so the
   join grows ~K². The prefix filter probes only the smaller side's
   rarest-shingle prefix against the postings, Σ_s prefix_df(s)·df(s)
   — the whole claim of the scale path is that its K-curve is far
   below the naive one.
2. ``ivfpq_knn_embeddings`` — fixed 10-query probe set; the ADC scan
   touches only probed lists (nprobe/nlist of the corpus), so the
   probe should grow sublinearly; training (once per corpus) is timed
   separately via the memoized first call.
3. ``value_drift_psi`` — one events scan + a 1-row bounds broadcast ⇒
   ≈linear.
4. ``jl_project_embeddings`` — narrow per-row map, no shuffle ⇒
   ≈linear.

Driver max-RSS is printed alongside (must stay flat — no corpus-sized
driver state). Run:

    python tools/stress_r7.py [K]

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
from tools.stress_ann import perturbed_vectors  # noqa: E402
from tools.stress_dedup import perturbed_copies  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TMP = "/tmp/stress_r7"


def driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def timed(label: str, build) -> float:
    t0 = time.perf_counter()
    n = build().count()
    dt = time.perf_counter() - t0
    print(f"  {label:34s} {dt:7.2f}s  ({n} result rows)")
    return dt


def build_warehouse(spark, k: int) -> str:
    docs_full = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = docs_full.select("doc_id", "text")
    n_docs = docs.count()
    # re-attach the metadata columns the curation/DSIR entries read
    # (perturbed_copies keeps only doc_id/text; copy i of doc d has
    # id d + i·n, so d = id % n recovers the original's lang/source)
    meta = docs_full.select(
        F.col("doc_id").alias("orig_id"), "lang", "source"
    )
    (
        perturbed_copies(docs, k)
        .withColumn("orig_id", F.col("doc_id") % n_docs)
        .join(meta, "orig_id")
        .select(
            "doc_id", "text", "lang", "source",
            F.length("text").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{TMP}/documents.parquet")
    )
    emb_full = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb_full.select("vec_id", "embedding")
    n_vecs = emb.count()
    # carry label through the copies (perturbed_vectors keeps only
    # vec_id/embedding; copy i of vector v has id v + i·n)
    vmeta = emb_full.select(F.col("vec_id").alias("orig_vid"), "label")
    (
        perturbed_vectors(emb, k)
        .withColumn("orig_vid", F.col("vec_id") % n_vecs)
        .join(vmeta, "orig_vid")
        .select("vec_id", "embedding", "label")
        .write.mode("overwrite")
        .parquet(f"{TMP}/embeddings.parquet")
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    me = ev.agg(F.max("event_id")).collect()[0][0] + 1
    mu = ev.agg(F.max("user_id")).collect()[0][0] + 1
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
    return TMP


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"load1={os.getloadavg()[0]:.2f} cpus={os.cpu_count()}")
    spark = get_spark("stress_r7")
    big = build_warehouse(spark, k)
    print(f"warehouse: documents/embeddings/events at {k}x under {TMP}\n")
    clear_state(spark)

    from movie_data_pipeline_spark.plans.analytics import QUERIES

    results: dict[str, list[float]] = {}

    def run(name: str, label: str, sf_dir: str, idx: int) -> None:
        builder, _ = QUERIES[name]
        dt = timed(f"{name} {label}", lambda: builder(spark, sf_dir))
        results.setdefault(name, [0.0, 0.0])[idx] = dt
        clear_state(spark)

    for label, sf_dir, idx in [("1x", SF_DIR, 0), (f"{k}x", big, 1)]:
        print(f"[{label}]  driver max-RSS so far: {driver_rss_mb():.0f} MB")
        # ivfpq: first call trains the (memoized) coarse+PQ quantizers
        # on a bounded sample — time train+probe, then probe-only warm
        t0 = time.perf_counter()
        QUERIES["ivfpq_knn_embeddings"][0](spark, sf_dir).count()
        print(f"  {'ivfpq train+probe ' + label:34s} "
              f"{time.perf_counter() - t0:7.2f}s")
        clear_state(spark)
        run("ivfpq_knn_embeddings", f"warm {label}", sf_dir, idx)
        run("prefix_containment_pairs", label, sf_dir, idx)
        run("containment_dedup_pairs", label, sf_dir, idx)
        run("value_drift_psi", label, sf_dir, idx)
        run("jl_project_embeddings", label, sf_dir, idx)
        print()

    print(f"driver max-RSS at end: {driver_rss_mb():.0f} MB")
    print(f"\n{'operator':34s} {'1x':>8s} {k:>7d}x {'ratio':>7s}")
    for name, (t1, tk) in results.items():
        print(f"{name:34s} {t1:7.2f}s {tk:7.2f}s {tk / t1:6.1f}x")


if __name__ == "__main__":
    main()
