"""Benchmark decontamination — flag training documents that share long
n-gram spans with an evaluation/benchmark set.

The standard pre-training hygiene step (the reference pipeline has no
analog — this extends the additive training-data surface): any training
document that reproduces an n-gram run from a held-out benchmark would
leak eval answers into the model, so it must be found and dropped
before training. The industry-standard span length is 13 tokens; the
knob is exposed because short synthetic corpora need smaller n.

Scale posture: the benchmark side is bounded by nature (eval suites are
thousands of documents; the corpus is billions), so its distinct
n-grams are BROADCAST — hint-policy-compliant — and the corpus is
touched in one narrow tokenize/explode pass followed by one keyed
aggregation on (doc_id, bench_id). No corpus-side text shuffle, no
self-join: cost is O(corpus tokens) map work + a hit-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def _ngram_sets(docs: DataFrame, out_id: str, n: int, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias(out_id),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("ng"),
    )


def benchmark_decontamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, shared_ngrams) for every training document
    sharing ≥ ``min_hits`` distinct word ``n``-grams with a benchmark
    document. Callers drop (or flag) the returned doc_ids before
    training."""
    t = _ngram_sets(train, "doc_id", n, id_col, text_col)
    b = _ngram_sets(bench, "bench_id", n, id_col, text_col)
    return (
        t.join(F.broadcast(b), "ng")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_hits)
    )
