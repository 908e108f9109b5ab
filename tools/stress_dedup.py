"""Scale stress for the dedup/similarity families: build a K× corpus
from sf0.1's documents (each copy deterministically perturbed so copies
are near- but not exact duplicates), then time each family at 1× and K×.

The point is the growth CURVE, not the absolute numbers: candidate
generation must scale ~linearly with corpus size (LSH bucket joins),
never quadratically. Run:

    python tools/stress_dedup.py [K]

Writes nothing outside /tmp.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from movie_data_pipeline_spark.operators.dedup import (  # noqa: E402
    exact_duplicate_groups,
    minhash_lsh_duplicates,
    simhash_duplicates,
)
from movie_data_pipeline_spark.session import get_spark  # noqa: E402


def perturbed_copies(docs, k: int):
    """k deterministic variants per doc: copy 0 is the original; copy
    i>0 prefixes ~1/3 of tokens (hash-selected per copy) so variants
    are near-duplicates of each other, not byte-identical."""
    n = docs.count()
    copies = docs.crossJoin(F.broadcast(
        docs.sparkSession.range(k).select(F.col("id").alias("copy"))
    ))
    toks = F.split(F.col("text"), r"\s+")
    mutated = F.array_join(
        F.transform(
            toks,
            lambda t: F.when(
                (F.col("copy") > 0)
                & (F.pmod(F.xxhash64(t, F.col("copy")), F.lit(3)) == 0),
                F.concat(F.lit("v"), F.col("copy").cast("string"), t),
            ).otherwise(t),
        ),
        " ",
    )
    return copies.select(
        (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
        mutated.alias("text"),
    )


def timed(label: str, df) -> float:
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"  {label:28s} {dt:7.2f}s  ({n} result rows)")
    return dt


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress_dedup")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )

    big_path = "/tmp/stress_docs"
    perturbed_copies(base, k).write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    print(f"corpus: {base.count()} -> {big.count()} docs (K={k})\n")

    for label, corpus in [("1x", base), (f"{k}x", big)]:
        print(f"[{label}]")
        timed("exact_duplicate_groups", exact_duplicate_groups(corpus))
        spark.catalog.clearCache()
        timed("minhash_lsh_duplicates", minhash_lsh_duplicates(corpus, threshold=0.7))
        spark.catalog.clearCache()
        timed("simhash_duplicates", simhash_duplicates(corpus, max_hamming=3))
        spark.catalog.clearCache()
        print()


if __name__ == "__main__":
    main()
