"""Byte-pair-encoding tokenizer training — the third iterative-
fixpoint operator family (after connected components and PageRank),
and the tokenizer-side pillar of a training-data pipeline: learn the
merge table that turns a raw corpus into subword tokens.

Algorithm (Sennrich et al. 2016, the form HF ``tokenizers`` trains):
collapse the corpus to a (word, count) vocabulary ONCE — the only
corpus-sized pass — then repeat: count adjacent symbol pairs weighted
by word count, take the argmax (deterministic tie-break on (left,
right)), and greedily merge that pair left-to-right inside every
word's symbol sequence. Each round's distributed work is one explode +
one groupBy over the VOCABULARY relation, not the corpus, which is
exactly why production BPE trainers scale: a 100 TB corpus has a
bounded distinct-word vocabulary, and after the initial word count the
corpus is never touched again.

Execution discipline matches ``graph.py::pagerank``: a small fixed
driver loop, per-round ``localCheckpoint`` to stop 20 rounds of
withColumn/UDF from snowballing the plan, and the only driver-visible
data is the 1-row argmax per round (the learned model itself — the
merge table — is K rows by construction, the same "models live on the
driver" footing as the IVF centroids and PQ codebooks).

The greedy in-word merge is a sequential left-to-right scan no array
built-in expresses (overlaps: merging "a·a" in "a a a" must yield
["aa", "a"], not two overlapping pairs), so it is the documented
Arrow-batched pandas-UDF escape hatch — applied to vocabulary rows
only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[^\w']+"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) vocabulary of the corpus under the engine-standard
    tokenization (lowercase, split on non-word runs) — the single
    corpus-sized pass of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _adjacent_pairs(state: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol sequences."""
    pairs = F.expr(
        """
        CASE WHEN size(syms) >= 2 THEN
            transform(sequence(1, size(syms) - 1),
                      i -> struct(element_at(syms, i) AS l,
                                  element_at(syms, i + 1) AS r))
        ELSE array() END
        """
    )
    return (
        state.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("freq"))
    )


def _merge_applier(left: str, right: str):
    @F.pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        merged = left + right

        def one(seq):
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return syms.apply(one)

    return apply_merge


def train_bpe(
    spark: SparkSession, word_freqs: DataFrame, n_merges: int = 20
) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges from a (word, cnt)
    vocabulary. Returns the merge table (rank, left, right, freq) —
    rank is 1-based learning order. Stops early if no pair is left.

    Ties on frequency break lexicographically on (left, right), making
    the whole table deterministic for a given corpus — the property
    the verification gate and the cross-engine first-merge oracle rely
    on."""
    state = word_freqs.select(
        "cnt",
        F.filter(F.split(F.col("word"), ""), lambda c: c != "").alias("syms"),
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _adjacent_pairs(state)
            .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()  # 1-row argmax: the model row for this round
        )
        if not top:
            break
        l, r, freq = top[0].l, top[0].r, int(top[0].freq)
        merges.append((rank, l, r, freq))
        # lazy checkpoint: materialized by the NEXT round's argmax
        # collect, so each round costs one job instead of two while
        # lineage is still cut round-by-round
        state = state.withColumn(
            "syms", _merge_applier(l, r)(F.col("syms"))
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, freq bigint"
    )


def segment_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Segment each distinct word into subwords by applying the learned
    merges in rank order, each exhaustively left-to-right — exactly the
    evolution the trainer itself ran, so for any in-vocabulary word the
    segmentation equals the trainer's final state for that word.
    Adds a ``subwords array<string>`` column to ``words``.

    The merge table is the MODEL (K rows, driver-resident like the IVF
    centroids); it ships to executors inside the UDF closure, and the
    UDF runs over the distinct-word relation — vocabulary-sized, never
    corpus-sized."""
    ordered = list(merges)

    @F.pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        def one(w):
            syms = list(w)
            for left, right in ordered:
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.apply(one)

    return words.withColumn("subwords", seg(F.col("word")))


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Per-document subword statistics under a learned merge table:
    (doc_id, n_words, n_subwords). Segmentation runs once per DISTINCT
    word (the vocabulary relation), then broadcast-joins back onto the
    per-document token counts — the corpus is scanned once and never
    carries symbol arrays through a shuffle."""
    doc_words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    seg = segment_words(doc_words.select("word").distinct(), merges).select(
        "word", F.size("subwords").alias("word_subwords")
    )
    return (
        doc_words.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occurrences").alias("n_words"),
            F.sum(F.col("n_occurrences") * F.col("word_subwords")).alias(
                "n_subwords"
            ),
        )
    )
