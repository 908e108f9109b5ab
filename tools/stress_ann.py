"""Scale stress for the similarity / sampling families: build a K×
corpus from sf0.1's embeddings (each copy deterministically nudged so
copies are near- but not identical vectors) and documents, then time
each family at 1× and K×.

As with stress_dedup.py, the point is the growth CURVE: KNN paths must
scale ~linearly in corpus size (they are single scans — brute force
over raw vectors, PQ over 16-byte codes), and the window-based
sampling/split operators must stay one-shuffle linear. Run:

    python tools/stress_ann.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.operators.similarity import (  # noqa: E402
    brute_force_knn,
    get_ivf_centroids,
    ivf_knn,
    pq_encode,
    pq_knn,
    train_pq_codebooks,
)
from movie_data_pipeline_spark.plans.curation import (  # noqa: E402
    leakage_safe_split,
    stratified_sample_docs,
)
from movie_data_pipeline_spark.session import get_spark  # noqa: E402


def perturbed_vectors(emb, k: int):
    """k deterministic variants per vector: copy 0 is the original;
    copy i>0 adds a per-(vector, copy) hash-seeded epsilon to every
    dimension, so copies are near neighbors, not duplicates."""
    n = emb.count()
    copies = emb.crossJoin(
        F.broadcast(emb.sparkSession.range(k).select(F.col("id").alias("copy")))
    )
    eps = (
        F.pmod(F.xxhash64(F.col("vec_id"), F.col("copy")), F.lit(1000)).cast(
            "double"
        )
        / 10000.0
        * F.col("copy").cast("double")
    )
    vec = F.transform(
        F.col("embedding").cast("array<double>"), lambda x, i: x + eps * (i + 1) / 64.0
    )
    return copies.select(
        (F.col("vec_id") + F.col("copy") * n).alias("vec_id"),
        vec.cast("array<float>").alias("embedding"),
    )


def timed(label: str, df) -> float:
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"  {label:28s} {dt:7.2f}s  ({n} result rows)")
    return dt


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress_ann")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    big_path = "/tmp/stress_vecs"
    perturbed_vectors(base, k).write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    print(f"corpus: {base.count()} -> {big.count()} vectors (K={k})\n")

    # index state trains ONCE on the base corpus (bounded samples);
    # the K× run reuses it — that is the index-build contract
    books = train_pq_codebooks(base, m=16, nbits=8)
    cents = get_ivf_centroids(base, "stress", nlist=16)

    for label, corpus in [("1x", base), (f"{k}x", big)]:
        print(f"[{label}]")
        q = corpus.filter(F.col("vec_id") < 10)
        timed("brute_force_knn", brute_force_knn(corpus, q, k=5))
        spark.catalog.clearCache()
        timed("pq_encode+pq_knn", pq_knn(pq_encode(corpus, books), corpus, q, books, k=5))
        spark.catalog.clearCache()
        timed("ivf_knn", ivf_knn(corpus, q, cents, k=5, nprobe=4))
        spark.catalog.clearCache()
        print()

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = docs.count()
    big_docs = docs.crossJoin(
        F.broadcast(spark.range(k).select(F.col("id").alias("copy")))
    ).select(
        (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
        "lang",
        "source",
        F.concat(F.col("text"), F.lit(" c"), F.col("copy").cast("string")).alias(
            "text"
        ),
    )
    dd_path = "/tmp/stress_docs_ann"
    big_docs.write.mode("overwrite").parquet(dd_path + "/documents.parquet")
    print("[documents 1x -> %dx]" % k)
    timed("stratified_sample 1x", stratified_sample_docs(spark, "/root/testdata/sf0.1"))
    timed("stratified_sample Kx", stratified_sample_docs(spark, dd_path))
    timed("leakage_safe_split 1x", leakage_safe_split(spark, "/root/testdata/sf0.1"))
    timed("leakage_safe_split Kx", leakage_safe_split(spark, dd_path))


if __name__ == "__main__":
    main()
