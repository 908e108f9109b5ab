"""BM25 ranked retrieval over a document corpus — the scoring side of
a search engine, pure DataFrame ops end to end.

Plan shape (one pass over the corpus, two tiny shuffles):
  tokenize → explode carrying the doc length dl alongside each term
  (dl is functionally dependent on doc_id, so it rides the posting
  rows and the (doc, term, dl) groupBy for free — no separate
  per-doc lengths join) → filter to query terms (predicate BEFORE
  the heavy aggregation — only query-term postings survive the
  explode) → per-(doc, term) frequency → join the per-term
  document-frequency dim (broadcast; |query| rows) → BM25 partial
  score per posting → sum per doc → deterministic top-k.

The ONLY broadcasts are |query|-sized (df_dim) and 1-row
(n_docs/avgdl) — never O(corpus). (Round 1 broadcast a per-doc
lengths table: correct answer, driver-OOM plan at 100 TB.)
Determinism for the oracle gate: scores are rounded before ranking
and ties break on doc_id, so both engines select the same k rows
(raw float ULP differences can't flip the cut)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_ish_tokens


def bm25_top_docs(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by BM25 for a bag of query terms.

    Robertson/Sparck-Jones IDF with the +1 floor (Lucene's form):
    idf = ln(1 + (N - df + 0.5) / (df + 0.5)).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        bpe_ish_tokens(F.col(text_col)).alias("toks"),
    ).select("doc_id", F.size("toks").alias("dl"), "toks")
    n_and_avgdl = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    postings = (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_dim = postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )

    scored = (
        postings.join(F.broadcast(df_dim), "term")
        .crossJoin(F.broadcast(n_and_avgdl))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "partial",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("partial"), 3).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)
