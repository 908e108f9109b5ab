"""Twentieth registry batch (round 14): the registry's last canonical
LLM-dedup gap (r13 VERDICT items 1 and 3) — exact substring-span
dedup and the sentence-level dedup curation TRANSFORM that ext19's
`dup_sentence_stats` signal feeds. Both all-native Column algebra
(zero Python), both hash-oracled.

`exact_span_dedup`: Lee-et-al-class exact duplicate-span detection
("Deduplicating Training Data Makes Language Models Better", 2021):
for every document, the maximal token spans of length >= K that occur
at least twice in the corpus (any repeat counts — cross-doc or
within-doc — the suffix-array semantics of the paper, expressed as
sorted fixed-stride shingle runs instead of a driver-side suffix
array). Pipeline: tokenize -> K-token rolling shingles keyed by
xxhash64 (the groupBy and join-back shuffle 8-byte hashes, never the
shingle strings) -> occurrence count >= 2 marks a shingle duplicated
-> per-doc gaps-and-islands over duplicated shingle START positions
merges overlapping/adjacent spans (two K-token windows starting at
g < g' cover a contiguous range iff g' - g <= K, so an island breaks
when the gap exceeds K and each island covers exactly
max(gs) - min(gs) + K tokens). The shipped corpus contains genuine
repeated spans (the testdata generator plants near-duplicate document
families), and — the ext16-19 injection precedent — the query
additionally prepends a 16-token license header on doc_id % 5 == 0
and appends an 18-token reuse notice on doc_id % 4 != 2 with
IDENTICAL concat expressions on both engines, so the output exercises
0-, 1- and 2-span documents and span merging at every SF.

`drop_dup_sentences_docs`: the C4 curation rewrite (ext19 computed
the SIGNAL; this is the op a pipeline actually runs): drop every
sentence instance whose normalized text occurs in >= 2 DISTINCT
documents, except in the single keeper document (min doc_id), which
retains its copy — C4's "keep one occurrence in the corpus" rule.
Within-doc repeats are untouched (nd counts distinct docs). Sentence
injection, boundary marking and normalization reuse ext19's
definitions verbatim (imported, not copied), so the transform drops
exactly the sentences `dup_sentence_stats` counts. Output proves the
REWRITTEN BYTES equal across engines via md5 (the redact_pii_docs
precedent, analytics_ext18.py), not just the kept/dropped counts.

Scale posture: exact_span_dedup's corpus-wide shuffles (the
occurrence aggregate and the join probe — two k-keyed exchanges, two
shingle scans) carry only (k: long, doc_id, gs) triples — the shingle
text is hashed map-side and never moves. The single-scan alternative
(count over a Window partitioned by k) was rejected: Spark's
unbounded window frame buffers each key's whole partition run, so a
viral shingle OOMs where the groupBy's map-side partials and AQE
skew-join do not; if the second scan ever dominates at real scale,
stage the shingle frame to parquet once and read it twice.
Islands/spans run in doc-partitioned windows and the following
doc-keyed groupBys reuse that partitioning (no further exchange).
drop_dup_sentences_docs must move sentence TEXT once (its output IS
rewritten text — C4's own rewrite pays the same shuffle); the
sentence-stats side joins back on the 8-byte key. Corpus-sized
outputs end in sortWithinPartitions per the r13 presentation-sort
convention.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .analytics_ext19 import SENTENCE_CTE_SQL, sentence_instances

# Span length in tokens: matches the decontamination family's 13-gram
# convention (operators/decontam.py).
_SPAN_K = 13
# Planted spans (identical literals in both engines; both >= _SPAN_K
# tokens so every planted copy is detectable on its own).
_HEADER_SPAN = (
    "begin standard license header tokens alpha beta gamma delta "
    "epsilon zeta eta theta iota kappa end"
)  # 16 tokens
_FOOTER_SPAN = (
    "this corpus carries the shared reuse notice spanning twenty "
    "whole tokens for exact span dedup detection tests always"
)  # 18 tokens


def exact_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    t = F.concat(
        F.when(F.col("doc_id") % 5 == 0, F.lit(_HEADER_SPAN + " ")).otherwise(
            F.lit("")
        ),
        F.trim(F.col("text")),
        F.when(F.col("doc_id") % 4 != 2, F.lit(" " + _FOOTER_SPAN)).otherwise(
            F.lit("")
        ),
    )
    sized = docs.select(
        "doc_id", F.split(F.trim(t), r"[ \t\r\n]+").alias("tk")
    ).select("doc_id", F.size("tk").alias("n_tokens"), "tk")
    # K-token rolling shingles, keyed by hash map-side: the exploded
    # rows that reach the shuffle are (k, doc_id, gs) — 24 bytes.
    sh = (
        sized.filter(F.col("n_tokens") >= _SPAN_K)
        .select(
            "doc_id",
            "tk",
            F.explode(
                F.sequence(F.lit(0), F.col("n_tokens") - _SPAN_K)
            ).alias("gs"),
        )
        .select(
            "doc_id",
            "gs",
            F.xxhash64(
                F.array_join(
                    F.slice("tk", F.col("gs") + 1, F.lit(_SPAN_K)), " "
                )
            ).alias("k"),
        )
        # materialized ONCE (r14): the occurrence groupBy and the dup
        # join probe below previously each re-derived the whole
        # tokenize+slice+join+hash shingle pass — the module docstring's
        # own "stage the shingle frame once and read it twice" remedy.
        # Payload is the 24-byte (k, doc_id, gs) triple, never shingle
        # text; integer outputs, so the oracle hash cannot move.
        .localCheckpoint()
    )
    # A shingle is duplicated if it occurs >= 2 times ANYWHERE (the
    # paper's suffix-array semantics — within-doc repeats count). An
    # xxhash64 collision (~2^-64/pair) would merge two shingles; the
    # DuckDB twin groups by the string, so the oracle hash catches a
    # collision as a mismatch rather than silently agreeing.
    occ = (
        sh.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
    )
    dup = sh.join(occ.select("k"), "k").select("doc_id", "gs")
    w = Window.partitionBy("doc_id").orderBy("gs")
    run = Window.partitionBy("doc_id").orderBy("gs").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = (
        dup.withColumn("prev", F.lag("gs").over(w))
        .withColumn(
            "island",
            F.sum(
                F.when(
                    F.col("prev").isNull()
                    | (F.col("gs") - F.col("prev") > _SPAN_K),
                    1,
                ).otherwise(0)
            ).over(run),
        )
    )
    # doc-partitioned window output is already clustered by doc_id, so
    # neither doc-keyed groupBy below adds an exchange.
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("gs").alias("s0"),
        (F.max("gs") + F.lit(_SPAN_K - 1)).alias("s1"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("s1") - F.col("s0") + 1).alias("dup_tokens"),
    )
    return (
        sized.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("long")
            .alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.round(
                F.coalesce(
                    F.col("dup_tokens").cast("double") / F.col("n_tokens"),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_token_frac"),
        )
        .sortWithinPartitions("doc_id")
    )


EXACT_SPAN_DEDUP_SQL = rf"""
WITH planted AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 5 = 0 THEN '{_HEADER_SPAN}' || ' ' ELSE '' END)
         || trim(text)
         || (CASE WHEN doc_id % 4 <> 2 THEN ' ' || '{_FOOTER_SPAN}' ELSE '' END)
             AS t
  FROM documents
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(t), '[ \t\r\n]+') AS tk
  FROM planted
),
nums AS (SELECT CAST(range AS INT) AS gs FROM range(0, 100000)),
sh AS (
  SELECT doc_id, gs, array_to_string(tk[gs + 1 : gs + {_SPAN_K}], ' ') AS s
  FROM toks JOIN nums ON gs <= len(tk) - {_SPAN_K}
),
occ AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2),
dup AS (SELECT sh.doc_id, sh.gs FROM sh JOIN occ USING (s)),
isl AS (
  SELECT doc_id, gs,
         SUM(CASE WHEN prev IS NULL OR gs - prev > {_SPAN_K} THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY gs) AS island
  FROM (SELECT doc_id, gs,
               LAG(gs) OVER (PARTITION BY doc_id ORDER BY gs) AS prev
        FROM dup)
),
spans AS (
  SELECT doc_id, island, MIN(gs) AS s0, MAX(gs) + {_SPAN_K - 1} AS s1
  FROM isl GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(s1 - s0 + 1) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(COALESCE(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(COALESCE(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(COALESCE(pd.dup_tokens / CAST(len(tk) AS DOUBLE), 0), 6)
           AS dup_token_frac
FROM toks t LEFT JOIN per_doc pd USING (doc_id)
ORDER BY t.doc_id
"""


def rewrite_without_cross_doc_dups(sent: DataFrame) -> DataFrame:
    """Per-doc rewrite of ``sent`` (doc_id, pos, sn): drop every
    sentence instance whose text occurs in >= 2 distinct docs unless
    this doc is the keeper (min doc_id). Returns (doc_id, n_kept,
    n_dropped, rebuilt) — factored from the registry entry so unit
    fixtures can feed crafted sentence sets directly."""
    # r15 reshape (guide §8, r14-VERDICT item 4): decide with NARROW
    # rows, move the text ONCE. The r14 version localCheckpointed the
    # corpus-sized TEXT frame and its join-back shuffled sentence text
    # by k — a key unrelated to the final doc_id grouping — so text
    # crossed two exchanges and sat in executor storage. Now the
    # staged relation is the 24-byte (doc_id, pos, k) triple (the
    # sibling stats entries' payload), the keeper decision and the
    # DROPPED instance set (duplicates only — almost always a small
    # fraction) are computed entirely on integers, and the text is
    # re-derived from the docs scan once at emit, crossing exactly one
    # exchange (the per-doc groupBy the rewrite output needs anyway).
    keyed = sent.select(
        "doc_id", "pos", F.xxhash64("sn").alias("k")
    ).localCheckpoint()
    stats = keyed.groupBy("k").agg(
        F.countDistinct("doc_id").alias("nd"),
        F.min("doc_id").alias("keeper"),
    )
    # only duplicated keys survive (nd >= 2 ⇔ a drop can happen), so
    # the join-back probe relation is duplicate-sized, not corpus-sized
    dropped = (
        keyed.join(stats.filter(F.col("nd") >= 2), "k")
        .filter(F.col("doc_id") != F.col("keeper"))
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("dp"))
    )
    # emit pass: one text derivation, grouped per doc (pos is unique
    # per doc, so array_sort on (pos, sn) structs restores document
    # order), then the narrow drop-position sets prune in-row.
    per_doc = sent.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "sn"))).alias("arr")
    )
    joined = per_doc.join(dropped, "doc_id", "left")
    kept = F.when(F.col("dp").isNull(), F.col("arr")).otherwise(
        F.filter(
            F.col("arr"), lambda x: ~F.array_contains(F.col("dp"), x["pos"])
        )
    )
    n_drop = F.coalesce(F.size("dp"), F.lit(0))
    return joined.select(
        "doc_id",
        (F.size("arr") - n_drop).cast("long").alias("n_kept"),
        n_drop.cast("long").alias("n_dropped"),
        F.array_join(
            F.transform(kept, lambda x: x["sn"]), " "
        ).alias("rebuilt"),
    )


def drop_dup_sentences_docs(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    rewritten = rewrite_without_cross_doc_dups(sentence_instances(docs))
    return (
        docs.select("doc_id")
        .join(rewritten, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0))
            .cast("long")
            .alias("n_dropped"),
            F.md5(
                F.coalesce("rebuilt", F.lit("")).cast("binary")
            ).alias("clean_fp"),
        )
        .sortWithinPartitions("doc_id")
    )


DROP_DUP_SENTENCES_SQL = rf"""
WITH {SENTENCE_CTE_SQL},
sent_docs AS (
  SELECT sn, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS keeper
  FROM sent GROUP BY sn
),
flagged AS (
  SELECT s.doc_id, s.pos, s.sn,
         (d.nd < 2 OR s.doc_id = d.keeper) AS keep
  FROM sent s JOIN sent_docs d USING (sn)
),
per_doc AS (
  SELECT doc_id,
         SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
         SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS n_dropped,
         COALESCE(string_agg(CASE WHEN keep THEN sn END, ' ' ORDER BY pos),
                  '') AS rebuilt
  FROM flagged GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(p.n_dropped, 0) AS BIGINT) AS n_dropped,
       md5(COALESCE(p.rebuilt, '')) AS clean_fp
FROM toks t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""


EXT20_QUERIES = {
    "exact_span_dedup": (exact_span_dedup, EXACT_SPAN_DEDUP_SQL),
    "drop_dup_sentences_docs": (
        drop_dup_sentences_docs,
        DROP_DUP_SENTENCES_SQL,
    ),
}
