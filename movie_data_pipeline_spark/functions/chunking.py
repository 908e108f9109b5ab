"""Fixed-size token chunking as a Python UDTF (Spark 3.5+/4.x) — the
one-row-to-N-rows generator surface the reference has no analogue for
(its only explode is the genre split, SURVEY §2.7). Chunking long
documents into fixed token windows is the standard pre-tokenization
step for LLM training corpora.

A UDTF (not explode-over-array) because the generator is imperative:
position bookkeeping, remainder handling, and per-chunk derived
fields live in plain Python while Spark handles distribution and the
lateral join. For pure fixed-stride chunking an all-native
slice/transform plan would also work; the UDTF keeps the extension
point open for tokenizer-aware chunking (sentence boundaries, overlap)
where native expressions genuinely can't follow.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


# useArrow: without it the lateral join runs as BatchEvalPythonUDTF —
# row-at-a-time pickling, the one Python boundary in the repo that
# wasn't Arrow-batched (caught by tests/test_plan_invariants.py; the
# PLANS.md "only Arrow surfaces" claim was wrong for this node until
# round 11)
@udtf(returnType="chunk_idx int, chunk string, chunk_tokens int", useArrow=True)
class ChunkTokensUDTF:
    """eval(text, chunk_size) → one row per chunk_size-token window."""

    def eval(self, text: str, chunk_size: int):
        if text is None:
            return
        toks = text.split()
        for i in range(0, len(toks), chunk_size):
            window = toks[i : i + chunk_size]
            yield i // chunk_size, " ".join(window), len(window)


def register(spark) -> None:
    spark.udtf.register("chunk_tokens", ChunkTokensUDTF)
