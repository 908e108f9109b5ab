"""State compaction for the streaming index/sketch surfaces (r14
self-review item): every ``current_*`` fold reads O(batches) partial
directories, so a long-lived deployment's read cost grows with drain
count even though the folded STATE is bounded. Each fold's output is
itself a valid partial (the closure laws the stream≡batch tests pin),
so compaction = fold everything once, publish it as the single base
partial at ``batch_id=-1`` (the reserved pre-stream slot the minhash
index's seeding already uses — a real micro-batch id is never
negative), and atomically swap the whole state root.

Contract: run BETWEEN drains, after ``awaitTermination`` has
returned. AvailableNow commits every processed batch to the
checkpoint before terminating, so no replay of a compacted batch can
occur afterwards, and the next drain under the SAME checkpoint
continues at fresh batch ids that cannot collide with the base
partial. Running a compaction concurrently with a draining stream is
FORBIDDEN (the drain could commit a batch whose partial the swap then
discards — a silent loss the checkpoint never replays) and ENFORCED:
compaction and every partial-writing drain take the root's exclusive
``state_write_lock`` (events.py), so the overlap raises instead of
losing data. A dead holder's lock is broken automatically.

Crash safety is the events.py ``_atomic_swap_parquet`` discipline:
the old root is renamed ASIDE (not deleted) before the staged root
renames into place, so the only crash window leaves
``<state_path>__old`` holding the complete prior state, restored by
``_recover_interrupted_swap`` at the top of the next compaction or
``current_*`` read. The stage write finishes before the live root is
touched, so a crash mid-fold changes nothing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import _recover_interrupted_swap, state_write_lock

BASE_BATCH_ID = -1


def compact_state_root(
    spark: SparkSession,
    state_path: str,
    fold,
    base_batch_id: int = BASE_BATCH_ID,
) -> None:
    """Replace every ``state_path/batch_id=N`` partial with ONE folded
    partial at ``batch_id=<base_batch_id>``. ``fold`` maps the
    DataFrame of all current partial rows (batch_id column dropped) to
    a valid partial with the write-side schema.

    The between-drains contract is ENFORCED, not just documented
    (r14 ADVICE item): the whole fold+swap runs under the root's
    ``state_write_lock``, the same lock every partial-writing drain
    holds for its run — a compaction attempted while a stream is
    mid-drain raises instead of discarding the partial a batch
    commits between the stage read and the rename."""
    with state_write_lock(state_path, "compaction"):
        _recover_interrupted_swap(state_path)
        cur = spark.read.parquet(state_path)
        if "batch_id" in cur.columns:
            cur = cur.drop("batch_id")
        folded = fold(cur)
        staged = state_path.rstrip("/") + "__staged"
        if os.path.exists(staged):
            shutil.rmtree(staged)
        # the fold EXECUTES here, reading the live root into the stage —
        # complete before the live root is renamed aside
        folded.write.mode("overwrite").parquet(
            os.path.join(staged, f"batch_id={base_batch_id}")
        )
        aside = state_path.rstrip("/") + "__old"
        if os.path.exists(aside):
            shutil.rmtree(aside)
        os.rename(state_path, aside)
        os.rename(staged, state_path)
        shutil.rmtree(aside)


def compact_sentence_index(spark: SparkSession, index_path: str) -> None:
    """Sentence-dedup index (streaming/docs.py): (doc_id, k, cnt)
    rows. (doc_id, k) pairs are unique across batches under the
    one-batch-per-doc contract, so the re-aggregation is a plain
    union; summing keeps the fold correct even for state written
    before that contract was enforced."""
    compact_state_root(
        spark,
        index_path,
        lambda df: df.groupBy("doc_id", "k").agg(
            F.sum("cnt").alias("cnt")
        ),
    )


def compact_minhash_index(spark: SparkSession, index_path: str) -> None:
    """Near-dup minhash index (streaming/docs.py): per-doc signatures
    never merge — compaction just rewrites the union (dropDuplicates
    on doc_id guards against pre-contract double folds)."""
    compact_state_root(
        spark,
        index_path,
        lambda df: df.select("doc_id", "sh", "bands").dropDuplicates(
            ["doc_id"]
        ),
    )


def compact_kmv_state(
    spark: SparkSession, state_path: str, group_col: str, k: int
) -> None:
    """KMV sketch state (streaming/sketches.py): bottom-k of the union
    is computable from the per-batch bottom-k states (the closure law
    current_sketches folds by) — the folded (group, kmv) IS a valid
    partial."""
    from pyspark.sql.window import Window

    def fold(df: DataFrame) -> DataFrame:
        return (
            df.select(group_col, F.explode("kmv").alias("_h"))
            .distinct()
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(group_col).orderBy("_h")
                ),
            )
            .filter(F.col("_rn") <= k)
            .groupBy(group_col)
            .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
        )

    compact_state_root(spark, state_path, fold)


def compact_ams_state(
    spark: SparkSession, state_path: str, reps: int
) -> None:
    """AMS sign-sum state (streaming/sketches.py): partials merge by
    ADDITION (integer-valued float sums, exact far beyond any corpus)
    — the merged (n, sums) row is a valid partial."""
    from ..operators.sketches import merge_ams_partials

    compact_state_root(
        spark,
        state_path,
        lambda df: merge_ams_partials(df, reps).select(
            F.col("n_rows").alias("n"), "sums"
        ),
    )


def compact_bloom_state(spark: SparkSession, state_path: str) -> None:
    """Streaming Bloom bitmap (streaming/docs.py): per-word bit_or —
    idempotent, so this is the one compaction where even overlapping
    generations could not double-count; the fold IS the read-side
    merge."""
    compact_state_root(
        spark,
        state_path,
        lambda df: df.groupBy("word_idx").agg(
            F.bit_or("word").alias("word")
        ),
    )


def compact_cms_state(spark: SparkSession, state_path: str) -> None:
    """Streaming count-min cells (streaming/sketches.py): per-cell
    addition — the merged sketch IS a valid partial (the AMS class:
    NOT idempotent, which is exactly why compaction must exclude
    concurrent drains; the lock does)."""
    from ..operators.sketches import merge_cms_partials

    compact_state_root(spark, state_path, merge_cms_partials)
