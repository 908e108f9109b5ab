"""Streaming KMV + AMS + count-min sketches: sketch state maintained
incrementally across micro-batches — the streaming twin of
``operators/sketches.py`` and the live demonstration of WHY a
mergeable sketch is the 100 TB posture: each micro-batch contributes
a bounded partial (O(groups * k) for KMV, O(reps) for AMS,
O(width * depth) for CMS), the current estimate is a fold of
partials, and no raw key is ever revisited.

Layout mirrors streaming/docs.py's minhash index: each micro-batch
publishes its PARTIAL sketches to ``state_path/batch_id=N/`` via a
staged atomic rename (``_atomic_partial_write``), so an at-least-once
replay rewrites byte-identical files instead of double-counting (the
partials are hash-deterministic functions of the batch rows alone)
and a mid-write crash can never expose a truncated partial. The merged current state is a
read-side fold — KMV's closure law (bottom-k of a union is computable
from bottom-k states; unit-proven in tests/test_sketches.py) makes
the fold exact: the streamed sketch is BYTE-IDENTICAL to the batch
sketch over the same rows, which is what the stream≡batch test pins.

Additive surface like streaming/events.py (the reference is pure
batch, SURVEY §2.10).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.sketches import kmv_estimate_expr, kmv_sketches
from .events import state_write_lock


def _atomic_partial_write(df: DataFrame, state_path: str, batch_id: int) -> None:
    """Publish a micro-batch partial to ``state_path/batch_id=N``
    atomically (r12 ADVICE item 4): a direct mode('overwrite') write
    leaves a TRUNCATED partial visible between a mid-write crash and
    the batch replay, and AMS's additive merge silently folds it into
    wrong sums (KMV's union merge merely under-estimates). Stage to a
    dot-prefixed sibling (invisible to Spark's partition discovery,
    and mode('overwrite') self-heals a crashed stage), then
    directory-rename into place — one atomic POSIX op, the same
    discipline as sinks.upsert_overwrite. Crash windows: during the
    stage write → published state untouched; between the two renames
    of a replay → the partial is absent for two SYSCALLS (r13 ADVICE
    item 2: the stale prior partial is renamed to a dot-prefixed
    tombstone, the stage renamed into place, and only then is the
    tombstone deleted — the old delete-then-rename order left the
    partial missing for a whole O(files) rmtree, which a current_*
    reader overlapping a replay would fold as a silent under-sum).
    The residual two-rename window is documented, not zero: a reader
    racing EXACTLY between them still misses the batch, so current_*
    readers overlapping a DRAINING stream get at-least-the-previous
    state, never a truncated one. Crash after the tombstone rename →
    the partial reads as never-processed, the checkpoint replays it
    (foreachBatch commits AFTER this returns), and the leftover
    tombstone is swept below. Object-store deployments would swap via
    their atomic commit API instead, as sinks.py already documents."""
    final = os.path.join(state_path, f"batch_id={batch_id}")
    stage = os.path.join(state_path, f".stage_batch_id={batch_id}")
    tomb = os.path.join(state_path, f".tomb_batch_id={batch_id}")
    df.write.mode("overwrite").parquet(stage)
    if os.path.exists(tomb):  # crashed predecessor's leftover
        shutil.rmtree(tomb)
    if os.path.exists(final):
        os.rename(final, tomb)
    os.rename(stage, final)
    if os.path.exists(tomb):
        shutil.rmtree(tomb)


def run_streaming_kmv(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    group_col: str,
    key_col: str,
    k: int = 512,
):
    """Drain ``stream`` with AvailableNow; each micro-batch folds its
    partial per-group sketch into ``state_path/batch_id=N/``."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = kmv_sketches(batch_df, group_col, key_col, k=k)
        _atomic_partial_write(
            partial.select(group_col, "kmv"), state_path, batch_id
        )

    # writer lock vs compact_kmv_state: a compaction overlapping the
    # drain would discard partials committed after its fold read
    with state_write_lock(state_path, "drain"):
        q = (
            stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return q


def current_sketches(
    spark: SparkSession, state_path: str, group_col: str, k: int
) -> DataFrame:
    """Fold all batch partials into the current per-group sketch +
    estimate — same output schema as ``kmv_sketches``.

    The fold explodes each partial's <= k hashes, dedups, and re-takes
    the bottom-k per group: input is O(batches * groups * k) sketch
    rows, never the raw keys. (When batch count grows unbounded,
    streaming/compaction.py::compact_kmv_state rewrites the state as
    one base partial via exactly this fold.)
    """
    from .events import _recover_interrupted_swap

    _recover_interrupted_swap(state_path)  # crashed compaction swap
    partials = spark.read.parquet(state_path)
    merged = (
        partials.select(group_col, F.explode("kmv").alias("_h"))
        .distinct()
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy(group_col).orderBy("_h")),
        )
        .filter(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )
    return merged.select(
        group_col,
        "kmv",
        F.size("kmv").alias("n_kmv"),
        kmv_estimate_expr(F.col("kmv"), k).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Streaming AMS sign sketches (round 12, the r11 batch additions'
# streaming twin). AMS partials merge by ADDITION — which is exactly
# why the replay discipline matters more than for KMV: re-adding a
# replayed batch's partial would silently double-count (KMV's
# array-union merge is idempotent; a sum is not). The same
# batch_id=N overwrite layout makes the at-least-once replay rewrite
# a byte-identical partial instead of contributing twice. Exactness:
# every replica sum is integer-valued (each row contributes ±1), and
# integers are exact in float64 far beyond any batch size, so the
# read-side re-fold is associative without rounding — the streamed
# sums equal operators/sketches.ams_replica_sums over the union of
# batch rows EXACTLY, which the stream≡batch test pins.
# ---------------------------------------------------------------------------


def run_streaming_ams(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    reps: int,
    block_bits: int | None = None,
):
    """Drain ``stream`` with AvailableNow; each micro-batch writes its
    (n, sums) AMS partial to ``state_path/batch_id=N/``.

    ``block_bits`` must match whatever the batch-side consumer uses
    (the median-of-means estimators pass block_bits=mean_group so each
    medianed group is a disjoint 4-wise block polynomial) — the
    (n, sums) schema carries no trace of the sign layout, so a
    mismatch would be silent. None → the operators' default."""
    from ..operators.sketches import _DEFAULT_BLOCK_BITS, ams_replica_sums

    bb = _DEFAULT_BLOCK_BITS if block_bits is None else block_bits

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = ams_replica_sums(
            batch_df, key_col, reps, block_bits=bb
        ).select(F.col("n_rows").alias("n"), "sums")
        _atomic_partial_write(partial, state_path, batch_id)

    # writer lock vs compact_ams_state — see run_streaming_kmv
    with state_write_lock(state_path, "drain"):
        q = (
            stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return q


def current_ams_sums(
    spark: SparkSession, state_path: str, reps: int
) -> DataFrame:
    """Fold all batch partials into the current (n_rows, sums) — same
    output schema as ``ams_replica_sums``, via the SAME shared merge
    (operators/sketches.py::merge_ams_partials: per-replica-index sum
    over O(batches) bounded rows, zeros(reps) identity on empty
    state)."""
    from ..operators.sketches import merge_ams_partials
    from .events import _recover_interrupted_swap

    _recover_interrupted_swap(state_path)  # crashed compaction swap
    return merge_ams_partials(spark.read.parquet(state_path), reps)


# ---------------------------------------------------------------------------
# Streaming count-min (round 14): per-batch (row_idx, pos, cnt) cell
# partials, merged by per-cell ADDITION — the AMS replay class (a sum
# is not idempotent), so correctness rides the byte-identical-partial
# layout exactly like the AMS stream. Each partial is bounded at
# width*depth cells regardless of batch size.
# ---------------------------------------------------------------------------


def run_streaming_cms(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    width: int = 4096,
    depth: int = 5,
):
    """Drain ``stream`` with AvailableNow; each micro-batch writes its
    CMS cell partial to ``state_path/batch_id=N``. (width, depth) are
    pinned in the ``.params.json`` sidecar — the cell schema cannot
    carry them, and summing cells hashed under different widths
    corrupts every estimate silently."""
    from ..operators.sketches import cms_sketch
    from .events import pin_state_params, state_write_lock

    pin_state_params(state_path, {"width": width, "depth": depth})

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _atomic_partial_write(
            cms_sketch(batch_df, key_col, width=width, depth=depth),
            state_path,
            batch_id,
        )

    # writer lock vs compact_cms_state — see run_streaming_kmv
    with state_write_lock(state_path, "drain"):
        q = (
            stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return q


def current_cms(spark: SparkSession, state_path: str) -> DataFrame:
    """Fold all batch partials into the current (row_idx, pos, cnt)
    sketch — same schema as ``cms_sketch``, via the SAME shared merge
    (operators/sketches.py::merge_cms_partials); byte-identical to
    the batch sketch over the union of streamed rows."""
    from ..operators.sketches import merge_cms_partials
    from .events import _recover_interrupted_swap

    _recover_interrupted_swap(state_path)  # crashed compaction swap
    return merge_cms_partials(spark.read.parquet(state_path))
