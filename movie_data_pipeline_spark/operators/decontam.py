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

Representation: n-grams are never materialized as strings. Each token
is hashed once (xxhash64), and a gram is the xxhash64-fold of its n
token hashes — an 8-byte join key instead of a ~50-char string, which
measured 5× faster end-to-end at sf0.1 and shrinks the broadcast by
the same factor. Collisions (~2⁻⁶⁴ per cross-pair) could only ADD a
spurious hit, never hide one; the DuckDB oracle twin states the
semantics over literal string n-grams and matches at every test SF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_ish_tokens


def _fold(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: F.xxhash64(acc, x)
    )


def _gram_hashes(docs: DataFrame, out_id: str, n: int, id_col: str, text_col: str) -> DataFrame:
    # token hashes materialized as a real column FIRST: expressions
    # captured inside HOF lambdas get no CSE, so hashing inside the
    # per-position lambda would re-tokenize per gram
    base = docs.select(
        F.col(id_col).alias(out_id),
        F.transform(
            bpe_ish_tokens(F.col(text_col)), lambda t: F.xxhash64(t)
        ).alias("th"),
    )
    grams = F.when(
        F.size("th") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("th") - n),
                lambda i: _fold(F.slice(F.col("th"), i + 1, n)),
            )
        ),
    ).otherwise(F.array(_fold(F.col("th"))))
    return base.select(out_id, F.explode(grams).alias("ng"))


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
    t = _gram_hashes(train, "doc_id", n, id_col, text_col)
    b = _gram_hashes(bench, "bench_id", n, id_col, text_col)
    return (
        t.join(F.broadcast(b), "ng")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_hits)
    )
