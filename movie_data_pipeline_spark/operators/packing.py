"""Sequence packing for training-data pipelines: assign documents to
fixed token-budget "packs" (the pre-tokenization analogue of example
packing for LLM training batches).

Distributed shape: docs are sharded by a deterministic hash of their
id (so the operation is embarrassingly parallel and reproducible under
any input partitioning), then packed greedily *within* each shard by
``applyInPandas``. Greedy first-fit over a hash shard is the standard
scale-out compromise: optimal bin packing is NP-hard and inherently
sequential, while per-shard greedy is linear, deterministic, and the
wasted tail per shard is bounded by one budget's worth of tokens.

At 100 TB the shard count is the parallelism knob — each shard's doc
list must fit one task comfortably (ids + token counts only; text
never moves through the packer).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("pack_tokens", T.LongType()),
    ]
)


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Greedy token-budget packing → one row per pack.

    A doc larger than ``budget`` gets a pack of its own (never split —
    splitting is the tokenizer's job downstream). Deterministic: shard
    assignment is ``crc32(id) % n_shards`` and packing order is sorted
    doc id, so results do not depend on input partitioning.
    """
    if tokens_col is None:
        toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    else:
        toks = F.col(tokens_col)
    slim = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        toks.cast("long").alias("n_tokens"),
        (F.crc32(F.col(id_col).cast("string").cast("binary")) % n_shards)
        .cast("int")
        .alias("shard"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        packs: list[tuple[int, int]] = []  # (n_docs, tokens)
        cur_docs, cur_tokens = 0, 0
        for t in pdf["n_tokens"].to_numpy():
            t = int(t)
            if cur_docs and cur_tokens + t > budget:
                packs.append((cur_docs, cur_tokens))
                cur_docs, cur_tokens = 0, 0
            cur_docs += 1
            cur_tokens += t
        if cur_docs:
            packs.append((cur_docs, cur_tokens))
        return pd.DataFrame(
            {
                "pack_id": [f"{shard}-{i}" for i in range(len(packs))],
                "n_docs": [n for n, _ in packs],
                "pack_tokens": [tk for _, tk in packs],
            }
        )

    return slim.groupBy("shard").applyInPandas(pack_shard, PACK_SCHEMA)
