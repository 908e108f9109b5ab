"""Seventeenth registry batch (round 12): sentence-boundary chunking
with a greedy token budget and sentence overlap — the UDTF surface's
reason to exist (r11 VERDICT item 3), proven against a definitional
recursive-CTE DuckDB oracle instead of asserted.

The shipped synthetic documents are punctuation-free token soup, so —
exactly like ext16's NULL-injection entry — the query first injects a
deterministic sentence structure (a period fused onto every 7th
token, pure Column algebra on the Spark side, an identical
explode/rebuild on the DuckDB side) and then chunks on the real
sentence boundaries that creates. The greedy packing itself
(variable-length sentence runs packed to a 40-token budget, 1
sentence of overlap carried between consecutive chunks, lone
over-budget sentences kept whole) is sequential per document: native
Column algebra has no fold that emits variable-length windows, which
is why the generator is a Python UDTF
(functions/chunking.py::ChunkSentencesUDTF) while the oracle
expresses the same definition as a recursive CTE over sentence
prefix sums.

Scale posture: the lateral UDTF is Arrow-batched and embarrassingly
parallel per document — no shuffle ANYWHERE in the plan (the
corpus-sized output carries only a sortWithinPartitions, per the r13
presentation-sort convention in plans/analytics.py); state is O(one
document's sentences) per eval call.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_BUDGET = 40
_OVERLAP = 1
_SENT_LEN = 7  # inject a '.' onto every 7th token


def _sentenced(docs: DataFrame) -> DataFrame:
    """documents + a `sentenced` column: the doc text with a period
    fused onto every ``_SENT_LEN``-th token (whitespace normalized to
    single spaces by the re-join) — deterministic sentence injection,
    zero Python."""
    toks = F.split(F.trim(F.col("text")), r"[ \t\r\n]+")
    with_dots = F.transform(
        toks,
        lambda x, i: F.concat(
            x,
            F.when((i % _SENT_LEN) == _SENT_LEN - 1, F.lit("."))
            .otherwise(F.lit("")),
        ),
    )
    return docs.select(
        "doc_id", F.array_join(with_dots, " ").alias("sentenced")
    )


def chunk_docs_sentences(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions import chunking

    chunking.register(spark)
    _sentenced(load_table(spark, sf, "documents")).createOrReplaceTempView(
        "chunk_sent_src"
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.chunk_tokens
        FROM chunk_sent_src d,
             LATERAL chunk_sentences(d.sentenced, {_BUDGET}, {_OVERLAP}) c
        """
    ).sortWithinPartitions("doc_id", "chunk_idx")


# Definitional twin of ChunkSentencesUDTF.eval: sentence split on the
# same engine-portable boundary ([.!?] + explicit ASCII whitespace —
# RE2 has no lookbehind, so the boundary is marked with \x1e via
# capture-replace), token counts via prefix sums, then the greedy
# packing as a recursive CTE: each step finds the furthest sentence
# whose cumulative token count since the chunk start fits the budget
# (or keeps a lone over-budget sentence whole) and re-opens the next
# chunk `overlap` sentences back, clamped to always advance.
# _BUDGET/_OVERLAP/_SENT_LEN are interpolated below (r12 ADVICE item
# 1) so the Spark plan and this twin can never silently desync on a
# constant change.
CHUNK_DOCS_SENTENCES_SQL = rf"""
WITH RECURSIVE
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\r\n]+') AS tk
  FROM documents
),
-- token/sentence index domain: bounds docs at 100k tokens, the same
-- cap CHUNK_DOCS_SQL uses (TESTDATA docs are ~50-600 tokens; a corpus
-- exceeding it would truncate the ORACLE side only — raise both caps
-- together if the testdata generator ever ships longer documents)
nums AS (SELECT CAST(range AS INT) AS gs FROM range(0, 100000)),
sent_text AS (
  SELECT doc_id,
         string_agg(tok || CASE WHEN gs % {_SENT_LEN} = {_SENT_LEN - 1}
                                THEN '.' ELSE '' END,
                    ' ' ORDER BY gs) AS m
  FROM (SELECT doc_id, gs, tk[gs + 1] AS tok
        FROM toks JOIN nums ON gs < len(tk))
  GROUP BY doc_id
),
marked AS (
  SELECT doc_id,
         regexp_replace(m, '([.!?])[ \t\r\n]+', '\1' || chr(30), 'g') AS m
  FROM sent_text
),
arrs AS (SELECT doc_id, string_split(m, chr(30)) AS arr FROM marked),
rawsent AS (
  SELECT doc_id, gs AS raw_idx, arr[gs + 1] AS s
  FROM arrs JOIN nums ON gs < len(arr)
),
sent AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw_idx) - 1 AS i,
         array_to_string(regexp_split_to_array(trim(s), '[ \t\r\n]+'), ' ')
             AS snorm,
         len(regexp_split_to_array(trim(s), '[ \t\r\n]+')) AS nt
  FROM rawsent WHERE trim(s) <> ''
),
cum AS (
  SELECT doc_id, i, snorm, nt,
         SUM(nt) OVER (PARTITION BY doc_id ORDER BY i) AS p
  FROM sent
),
nd AS (SELECT doc_id, COUNT(*) AS n FROM sent GROUP BY doc_id),
chunks AS (
  SELECT nd.doc_id, 0 AS chunk_idx, 0 AS s_start,
         coalesce((SELECT max(i) FROM cum c2
                   WHERE c2.doc_id = nd.doc_id AND c2.p <= {_BUDGET}), 0)
             AS s_end
  FROM nd
  UNION ALL
  SELECT ch.doc_id, ch.chunk_idx + 1,
         greatest(ch.s_start + 1, ch.s_end + 1 - {_OVERLAP}) AS s_start,
         coalesce(
           (SELECT max(i) FROM cum c2
            WHERE c2.doc_id = ch.doc_id
              AND c2.i >= greatest(ch.s_start + 1, ch.s_end + 1 - {_OVERLAP})
              AND c2.p - coalesce(
                    (SELECT p FROM cum c3
                     WHERE c3.doc_id = ch.doc_id
                       AND c3.i = greatest(ch.s_start + 1,
                                           ch.s_end + 1 - {_OVERLAP}) - 1),
                    0) <= {_BUDGET}),
           greatest(ch.s_start + 1, ch.s_end + 1 - {_OVERLAP})) AS s_end
  FROM chunks ch JOIN nd ON nd.doc_id = ch.doc_id
  WHERE ch.s_end < nd.n - 1
)
SELECT c.doc_id, CAST(c.chunk_idx AS INT) AS chunk_idx,
       (SELECT array_to_string(list(snorm ORDER BY i), ' ') FROM cum s
        WHERE s.doc_id = c.doc_id
          AND s.i BETWEEN c.s_start AND c.s_end) AS chunk,
       CAST((SELECT SUM(nt) FROM cum s
             WHERE s.doc_id = c.doc_id
               AND s.i BETWEEN c.s_start AND c.s_end) AS BIGINT)
           AS chunk_tokens
FROM chunks c
ORDER BY doc_id, chunk_idx
"""


EXT17_QUERIES = {
    "chunk_docs_sentences": (chunk_docs_sentences, CHUNK_DOCS_SENTENCES_SQL),
}
