"""Twenty-first registry batch (round 14): Bloom-filter
decontamination — the membership-probe path for reference sets too
large to broadcast exactly (operators/decontam.py's module comment
derives the ~5-8x shrink vs the 64-bit gram-hash set). The filter is
a RELATION of (word_idx, word) bitmap rows, built by groupBy+bit_or
and probed by a broadcast join — never a driver-side object. All
pure JVM Column algebra (xxhash64 / pmod / shiftleft / bit_or).

Two entries, the repo's rows-only + oracled-gate contract:

`bloom_decontaminate_docs` (rows-only): the operator output over the
same pseudo-benchmark split as `decontaminate_docs`
(plans/curation.py — doc_id % 50 == 0 stands in for an eval suite,
n=8 on the short synthetic docs). No SQL twin: the bitmap semantics
are not DuckDB-expressible, which is exactly why the gate below
exists.

`bloom_decontam_check` (oracled, 1-row digest): proves the two laws
Bloom guarantees analytically. (a) NO FALSE NEGATIVES — every
document the exact operator flags is Bloom-flagged (a truly shared
gram sets all its bits by construction, so a miss is impossible;
the gate measures it anyway because it would catch any build/probe
hash-derivation drift). (b) the gram-level false-positive rate is
within 4x the classic (1 - e^{-kn/m})^k bound plus a +10 absolute
Poisson-tail slack (tiny corpora have single-digit expected fp
counts, where a 4x multiplicative band alone would flake). DuckDB
recomputes the EXACT side (docs + pairs, the decontaminate_docs
twin's CTEs); the booleans ride as TRUE literals the Spark side must
match — the suite-gate convention (plans/verification.py).

Scale posture: bitmap construction shuffles k 8-byte positions per
distinct reference gram into m/64 bitmap rows; the probe is one
narrow corpus scan exploding k positions per gram against the
broadcast bitmap, then a (doc_id, ng) partial-aggregated count — no
corpus text is ever shuffled and nothing corpus-sized reaches the
driver. At a real 100 TB run m is sized to the reference corpus
(9.6 bits/gram at 1% fp) and the bitmap stays a few GB where the
exact hash set would be tens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decontam import (
    _gram_hashes,
    benchmark_decontamination,
    bloom_decontamination,
    bloom_hit_grams,
)
from ..sources.catalog import load_table

# Registry parameters: n=8 matches decontaminate_docs on the short
# synthetic docs; m=2^17 bits / k=7 put the sf0.01 bench-gram load
# (~10^3-10^4 grams) in the classic low-fp regime while keeping the
# bitmap at <= 2048 rows.
_N = 8
_M_BITS = 1 << 17
_K = 7


def _split(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf, "documents")
    return (
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
    )


def bloom_decontaminate_docs(spark: SparkSession, sf: str) -> DataFrame:
    train, bench = _split(spark, sf)
    return bloom_decontamination(
        train, bench, n=_N, m_bits=_M_BITS, k=_K
    ).orderBy("doc_id")


def bloom_decontam_check(spark: SparkSession, sf: str) -> DataFrame:
    train, bench = _split(spark, sf)
    exact = benchmark_decontamination(train, bench, n=_N)
    ex_agg = exact.agg(
        F.countDistinct("doc_id").cast("long").alias("n_exact_docs"),
        F.count(F.lit(1)).cast("long").alias("n_exact_pairs"),
    )
    bl_docs = bloom_decontamination(
        train, bench, n=_N, m_bits=_M_BITS, k=_K
    ).select("doc_id")
    fn = (
        exact.select("doc_id")
        .distinct()
        .join(bl_docs, "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_fn"))
    )
    # gram-level fp accounting: probes = per-doc distinct train grams,
    # members = probes truly present in the reference gram set,
    # hits = probes the bitmap cannot rule out (member + fp)
    probes = _gram_hashes(train, "doc_id", _N, "doc_id", "text")
    b_grams = (
        _gram_hashes(bench, "bench_id", _N, "doc_id", "text")
        .select("ng")
        .distinct()
    )
    hits = bloom_hit_grams(train, bench, n=_N, m_bits=_M_BITS, k=_K)
    stats = (
        probes.agg(F.count(F.lit(1)).cast("double").alias("n_probe"))
        .crossJoin(
            F.broadcast(
                probes.join(F.broadcast(b_grams), "ng").agg(
                    F.count(F.lit(1)).cast("double").alias("n_member")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                hits.agg(F.count(F.lit(1)).cast("double").alias("n_hit"))
            )
        )
        .crossJoin(
            F.broadcast(
                b_grams.agg(
                    F.count(F.lit(1)).cast("double").alias("n_bench_grams")
                )
            )
        )
    )
    fp_bound = F.pow(
        F.lit(1.0)
        - F.exp(-F.lit(float(_K)) * F.col("n_bench_grams") / F.lit(float(_M_BITS))),
        F.lit(float(_K)),
    )
    return (
        ex_agg.crossJoin(F.broadcast(fn))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_exact_docs",
            "n_exact_pairs",
            (F.col("n_fn") == 0).alias("no_false_neg"),
            (
                (F.col("n_hit") - F.col("n_member"))
                <= fp_bound * (F.col("n_probe") - F.col("n_member")) * 4
                + F.lit(10.0)
            ).alias("fp_bound_ok"),
        )
    )


# DuckDB twin: the exact side only (decontaminate_docs' proven CTEs,
# n=8 -> 7-element windows in DuckDB's 1-based inclusive slicing);
# the Bloom-side booleans are TRUE literals the Spark row must match.
BLOOM_DECONTAM_CHECK_SQL = r"""
WITH g AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(toks) >= 8
                THEN list_transform(range(1, len(toks) - 6),
                                    i -> array_to_string(toks[i:i+7], ' '))
                ELSE [array_to_string(toks, ' ')] END)) AS ng
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^\w'']+'),
                       x -> x != '') AS toks
    FROM documents
  )
),
b AS (SELECT doc_id AS bench_id, ng FROM g WHERE doc_id % 50 = 0),
tr AS (SELECT doc_id, ng FROM g WHERE doc_id % 50 != 0),
p AS (
  SELECT tr.doc_id, b.bench_id
  FROM tr JOIN b USING (ng)
  GROUP BY tr.doc_id, b.bench_id
)
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_exact_docs,
       CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS no_false_neg, TRUE AS fp_bound_ok
FROM p
"""


EXT21_QUERIES = {
    "bloom_decontaminate_docs": (bloom_decontaminate_docs, None),
    "bloom_decontam_check": (bloom_decontam_check, BLOOM_DECONTAM_CHECK_SQL),
}
