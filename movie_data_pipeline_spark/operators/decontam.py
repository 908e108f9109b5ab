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


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (round 14): the scale path for
# reference sets too large to broadcast EXACTLY. benchmark_
# decontamination broadcasts the reference's distinct 64-bit gram
# hashes (8 bytes/gram) — fine for eval suites, but flagging against
# a multi-billion-gram reference corpus (e.g. "drop anything already
# in last year's crawl") needs ~5-8x less: a Bloom bitmap at k=7 /
# ~1% fp is ~9.6 bits per gram. The filter here is A RELATION, never
# a driver-side object: (word_idx, word) rows built by groupBy +
# bit_or — construction is one narrow shuffle of (k x grams) 8-byte
# positions, and the probe is a broadcast join on word_idx. Bloom
# guarantees NO FALSE NEGATIVES (every truly shared gram set all its
# bits), so contamination is never missed; false positives only
# over-flag, at the standard (1 - e^{-kn/m})^k rate the gate bounds.
# All pure JVM Column algebra: xxhash64 / pmod / shiftleft / bit_or.
# ---------------------------------------------------------------------------


def _bloom_positions(gram: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for one gram hash: xxhash64 re-seeded by probe
    index (seed i IS a second hashed column — xxhash64 is keyed on the
    tuple), reduced mod m. Independent-enough for the classic fp
    formula, and byte-reproducible across build and probe sides."""
    return [
        F.pmod(F.xxhash64(gram, F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_bitmap(
    grams: DataFrame, m_bits: int, k: int, gram_col: str = "ng"
) -> DataFrame:
    """Fold a gram-hash relation into Bloom bitmap rows
    (word_idx BIGINT, word BIGINT): bit positions explode map-side
    and bit_or into 64-bit words — bit_or is idempotent, so repeated
    positions need no dedup shuffle and the groupBy partial-aggregates
    map-side. At most m_bits/64 rows — broadcastable whenever m is
    sized for the reference set."""
    pos = grams.select(
        F.explode(
            F.array(*_bloom_positions(F.col(gram_col), m_bits, k))
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # pyspark's shiftleft() only takes a LITERAL shift count,
            # so the per-row count goes through the SQL form
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_hit_grams(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    k: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    bitmap: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, ng) for every distinct training n-gram the Bloom
    filter of the reference set cannot rule out (all k bits set).
    Gram-level primitive behind ``bloom_decontamination``; the fp
    gate measures its false-positive rate directly.

    ``bitmap`` short-circuits the build with a prebuilt filter —
    e.g. the incrementally-maintained streaming one
    (streaming/docs.py::current_bloom_bitmap); it must have been
    built with the SAME (n, m_bits, k), which the (word_idx, word)
    schema cannot carry — a mismatch silently degrades to
    flag-nothing or flag-everything, so callers own the pin."""
    if bitmap is None:
        if bench is None:
            raise ValueError(
                "bloom probe needs a reference: pass bench docs to "
                "build the filter, or a prebuilt bitmap"
            )
        b = _gram_hashes(bench, "bench_id", n, id_col, text_col).select("ng")
        bitmap = bloom_bitmap(b, m_bits, k)
    t = _gram_hashes(train, "doc_id", n, id_col, text_col)
    probes = t.select(
        "doc_id",
        "ng",
        F.explode(
            F.array(*_bloom_positions(F.col("ng"), m_bits, k))
        ).alias("pos"),
    ).select(
        "doc_id",
        "ng",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
        ).alias("mask"),
    )
    return (
        probes.join(F.broadcast(bitmap), "word_idx")
        .filter(F.col("word").bitwiseAND(F.col("mask")) == F.col("mask"))
        .groupBy("doc_id", "ng")
        .agg(F.count(F.lit(1)).alias("bits_set"))
        .filter(F.col("bits_set") == k)
        .select("doc_id", "ng")
    )


def bloom_decontamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    m_bits: int = 1 << 20,
    k: int = 7,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bitmap: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, flagged_grams) for every training document with
    >= ``min_hits`` n-grams the Bloom filter of the reference set
    cannot rule out. Superset of the exact operator's doc set (no
    false negatives); does not attribute WHICH reference doc matched
    — that is the information the bitmap compresses away. Probe cost:
    k positions per distinct train gram joined against the broadcast
    bitmap; a gram counts only when ALL k bits are set. ``bitmap``
    as in ``bloom_hit_grams`` (pass ``bench=None`` only with it)."""
    return (
        bloom_hit_grams(
            train, bench, n=n, m_bits=m_bits, k=k,
            id_col=id_col, text_col=text_col, bitmap=bitmap,
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("flagged_grams"))
        .filter(F.col("flagged_grams") >= min_hits)
    )
