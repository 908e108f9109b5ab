"""Structured Streaming tests: each streaming plan must agree with its
batch twin when the bounded events corpus is drained with
Trigger.AvailableNow (stream-batch equivalence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_data_pipeline_spark.streaming import events as SE

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged_events_dir(spark, tmp_path_factory):
    """Re-stage the events as µs timestamps (streaming file source
    needs a Spark-readable TimestampType). Goes through load_events so
    the physical ts type (ns-long vs timestamp) is handled once."""
    from movie_data_pipeline_spark.plans.analytics import load_events

    out = str(tmp_path_factory.mktemp("events_stream"))
    (
        load_events(spark, SF)
        .drop("ts")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us", "ts_sec")
        # range-partition by time so micro-batches arrive roughly in
        # event-time order (like a real stream) — otherwise the
        # watermark legitimately drops whole out-of-order files
        .repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    # The file stream source orders micro-batches by modification time;
    # parallel task commits scramble mtimes, so a late-time file can be
    # read first and advance the watermark past an entire earlier file.
    # Pin mtimes to path order (part-00000 = earliest ts range) so
    # arrival order matches event-time order deterministically.
    import os
    import time as _time

    parts = sorted(
        p for p in os.listdir(out) if p.startswith("part-") and p.endswith(".parquet")
    )
    base = _time.time()
    for i, p in enumerate(parts):
        os.utime(os.path.join(out, p), (base + i, base + i))
    return out


@pytest.fixture(scope="module")
def batch_events(spark, staged_events_dir):
    return spark.read.parquet(staged_events_dir).cache()


def test_hourly_counts_stream_equals_batch(spark, staged_events_dir, batch_events):
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(SE.hourly_counts(stream), "hourly_test")
    got = {
        (r.hour_epoch, r.event_type): (r.event_count, round(r.value_sum, 6))
        for r in spark.table("hourly_test").collect()
    }
    expected_df = (
        batch_events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum("value").alias("value_sum"),
        )
    )
    expected = {
        (r.hour_epoch, r.event_type): (r.event_count, round(r.value_sum, 6))
        for r in expected_df.collect()
    }
    assert got == expected


def test_sessionize_stream_counts(spark, staged_events_dir, batch_events):
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(SE.sessionize(stream), "sessions_test")
    rows = spark.table("sessions_test").collect()
    assert len(rows) > 0
    # total events across sessions == total events
    assert sum(r.n_events for r in rows) == batch_events.count()


def test_dedup_stream(spark, staged_events_dir, batch_events):
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(SE.dedup_stream(stream), "dedup_test", mode="append")
    assert (
        spark.table("dedup_test").count()
        == batch_events.select("event_id").distinct().count()
    )


def test_sliding_avg_stream_equals_batch(spark, staged_events_dir, batch_events):
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(SE.sliding_value_avg(stream), "sliding_test")
    got = {
        (r.window_start, r.event_type): round(r.value_avg, 6)
        for r in spark.table("sliding_test").collect()
    }
    expected_df = (
        batch_events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.avg("value").alias("value_avg"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "value_avg",
        )
    )
    expected = {
        (r.window_start, r.event_type): round(r.value_avg, 6)
        for r in expected_df.collect()
    }
    assert got == expected


def test_running_user_totals_stateful(spark, staged_events_dir, batch_events):
    """applyInPandasWithState: final per-user state must equal the
    batch aggregation (update mode -> keep each user's LAST emission)."""
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(SE.running_user_totals(stream), "running_test", mode="update")
    # update mode re-emits a user on every batch; the max n_events row
    # per user is the final state
    rows = spark.table("running_test").collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    expected = {
        r.user_id: r
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for uid, exp in expected.items():
        got = final[uid]
        assert got.n_events == exp.n_events, uid
        assert abs(got.value_sum - exp.value_sum) < 1e-6, uid
        assert abs(got.max_value - exp.max_value) < 1e-12, uid


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restarting from the same checkpoint must not reprocess consumed
    files, and must pick up only files added since."""
    import shutil
    from pathlib import Path

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    src.mkdir()

    from movie_data_pipeline_spark.plans.analytics import load_events

    base = (
        load_events(spark, "/root/testdata/sf0.001")
        .drop("ts")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us", "ts_sec")
    )
    base.filter("event_id < 500").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage1")
    )
    for p in Path(tmp_path / "stage1").glob("part-*.parquet"):
        shutil.copy(p, src / "batch1.parquet")

    stream = SE.read_events_stream(spark, str(src))
    SE.run_to_parquet(stream, out, chk)
    n1 = spark.read.parquet(out).count()
    assert n1 == base.filter("event_id < 500").count()

    # restart with no new files: nothing reprocessed
    stream = SE.read_events_stream(spark, str(src))
    SE.run_to_parquet(stream, out, chk)
    assert spark.read.parquet(out).count() == n1

    # add a second file: only its rows are appended
    base.filter("event_id >= 500").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage2")
    )
    for p in Path(tmp_path / "stage2").glob("part-*.parquet"):
        shutil.copy(p, src / "batch2.parquet")
    stream = SE.read_events_stream(spark, str(src))
    SE.run_to_parquet(stream, out, chk)
    assert spark.read.parquet(out).count() == base.count()


def test_enrich_stream_static_join(spark, staged_events_dir, batch_events):
    user_dim = (
        batch_events.select("user_id")
        .distinct()
        .withColumn(
            "tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd")
        )
    )
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(
        SE.enrich_stream(stream, user_dim), "enrich_test", mode="append"
    )
    got = spark.table("enrich_test")
    assert got.count() == batch_events.count()  # left join keeps all
    assert got.filter(F.col("tier").isNull()).count() == 0
    bad = got.filter(
        (F.col("user_id") % 2 == 0) != (F.col("tier") == "even")
    ).count()
    assert bad == 0


def test_stream_stream_join_equals_batch(spark, staged_events_dir, batch_events):
    stream = SE.read_events_stream(spark, staged_events_dir)
    joined = SE.purchases_after_clicks(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    SE.run_to_memory(joined, "ssj_test", mode="append")
    got = {
        (r.click_id, r.purchase_id) for r in spark.table("ssj_test").collect()
    }
    # batch twin: plain self-join with the same time-bound predicate
    c = batch_events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    p = batch_events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    want = {
        (r.cid, r.pid)
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("interval 1 hour")),
        ).collect()
    }
    # the stream result must be a subset (watermark may drop late rows)
    # and cover the overwhelming majority of the batch pairs
    assert got <= want
    assert len(got) >= 0.9 * len(want), (len(got), len(want))


def test_upsert_sink_matches_batch_last_write(spark, staged_events_dir, batch_events, tmp_path):
    from movie_data_pipeline_spark.sources.sinks import dedup_last_write_wins

    path = str(tmp_path / "user_state")
    ckpt = str(tmp_path / "ckpt")
    stream = SE.read_events_stream(spark, staged_events_dir).select(
        "user_id", "ts", "event_type", "value"
    )
    SE.run_upsert_sink(stream, path, ckpt, keys=["user_id"], order_col="ts")
    got = {
        r.user_id: (r.ts, r.event_type)
        for r in spark.read.parquet(path).collect()
    }
    want = {
        r.user_id: (r.ts, r.event_type)
        for r in dedup_last_write_wins(
            batch_events.select("user_id", "ts", "event_type", "value"),
            ["user_id"], "ts",
        ).collect()
    }
    assert set(got) == set(want)
    # latest timestamp per user must agree (event_type may tie-break
    # differently on equal ts; timestamps here are unique per user)
    assert {u: t for u, (t, _) in got.items()} == {
        u: t for u, (t, _) in want.items()
    }


def test_transform_with_state_event_type_counts(spark, staged_events_dir, batch_events):
    # transformWithState's state protocol rides on protobuf, absent in
    # this container — the operator targets protobuf-equipped clusters
    pytest.importorskip("google.protobuf.descriptor")
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(
        SE.per_user_event_type_counts(stream), "tws_test", mode="update"
    )
    # final state per (user, event_type) = the LAST update emitted
    rows = spark.table("tws_test").collect()
    final = {}
    for r in rows:  # memory sink appends updates in batch order
        final[(r.user_id, r.event_type)] = max(
            final.get((r.user_id, r.event_type), 0), r.n
        )
    want = {
        (r.user_id, r.event_type): r.n
        for r in batch_events.groupBy("user_id", "event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert final == want


def test_ewma_anomaly_flags_stream_equals_batch(
    spark, staged_events_dir, batch_events
):
    """Stateful streaming anomaly detection must flag exactly the rows
    a scalar batch replay of the same recurrence flags — state carries
    across micro-batches (the staged corpus spans 4 time-ordered
    files)."""
    stream = SE.read_events_stream(spark, staged_events_dir)
    SE.run_to_memory(
        SE.ewma_anomaly_flags(stream, alpha=0.2, z_threshold=3.0, min_obs=5),
        "anomaly_test",
        mode="append",
    )
    got = {
        (r.user_id, r.ts_us): (r.value, r.ewma_before, r.zscore)
        for r in spark.table("anomaly_test").collect()
    }

    rows = batch_events.select("user_id", "ts", "event_id", "value").collect()
    per_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        per_user.setdefault(r.user_id, []).append(r)
    expected = {}
    for uid, evs in per_user.items():
        n, mean, var = 0, 0.0, 0.0
        for r in evs:
            x = float(r.value)
            if n >= 5 and var > 0.0:
                dev = abs(x - mean) / (var ** 0.5)
                if dev > 3.0:
                    ts_us = int(r.ts.timestamp() * 1_000_000)
                    expected[(uid, ts_us)] = (x, mean, dev)
            if n == 0:
                mean, var = x, 0.0
            else:
                d = x - mean
                incr = 0.2 * d
                mean = mean + incr
                var = (1.0 - 0.2) * (var + d * incr)
            n += 1

    assert set(got) == set(expected)
    assert len(expected) > 0  # the corpus must actually exercise the path
    for k, (v, m, zz) in expected.items():
        gv, gm, gz = got[k]
        assert abs(gv - v) < 1e-9 and abs(gm - m) < 1e-9 and abs(gz - zz) < 1e-9


def test_streaming_dedup_index_equals_batch(spark, tmp_path):
    """The streaming incremental-dedup pipeline (seed index → probe +
    fold per micro-batch) must find exactly the pair set of running
    delta_near_dup_pairs batch-wise with a growing index — and a
    doc arriving AFTER its near-dup in an earlier micro-batch must be
    caught (state crosses batches through the persisted index)."""
    from movie_data_pipeline_spark.operators.dedup import (
        delta_near_dup_pairs,
        minhash_index,
    )
    from movie_data_pipeline_spark.streaming import docs as SD

    corpus_docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    seed = corpus_docs.filter(F.col("doc_id") % 3 == 0)
    b1 = corpus_docs.filter(F.col("doc_id") % 3 == 1)
    b2 = corpus_docs.filter(F.col("doc_id") % 3 == 2)

    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    stream_in = str(tmp_path / "incoming")
    minhash_index(seed).write.parquet(index_path + "/batch_id=-1")

    # stage the two deltas as separate files with ordered mtimes so
    # AvailableNow + maxFilesPerTrigger=1 drains them as two batches
    import os
    import time as _time

    os.makedirs(stream_in)
    b1.toPandas().to_parquet(stream_in + "/b1.parquet", index=False)
    b2.toPandas().to_parquet(stream_in + "/b2.parquet", index=False)
    base = _time.time()
    os.utime(stream_in + "/b1.parquet", (base, base))
    os.utime(stream_in + "/b2.parquet", (base + 5, base + 5))

    SD.run_streaming_dedup(
        SD.read_docs_stream(spark, stream_in),
        index_path,
        pairs_path,
        str(tmp_path / "ckpt"),
        threshold=0.5,
    )

    got = {
        (r.delta_id, r.match_id)
        for r in spark.read.parquet(pairs_path).collect()
    }

    # batch replay: b1 vs seed index, then b2 vs seed+b1 index
    idx1 = minhash_index(seed)
    exp1 = delta_near_dup_pairs(idx1, b1, threshold=0.5)
    idx2 = idx1.unionByName(minhash_index(b1))
    exp2 = delta_near_dup_pairs(idx2, b2, threshold=0.5)
    want = {
        (r.delta_id, r.match_id)
        for r in exp1.unionByName(exp2).collect()
    }
    assert got == want and len(got) > 0
    # at least one cross-batch pair proves index state carried over
    b1_ids = {r.doc_id for r in b1.select("doc_id").collect()}
    assert any(m in b1_ids for _, m in got)

    # REPLAY safety: re-processing a batch whose index fold already
    # committed (crash-after-fold, at-least-once redelivery) must
    # rewrite the SAME pairs — no self-pairs at jaccard 1.0, no
    # duplicated internal pairs (the probe anti-joins the batch's own
    # ids out of the index). Simulate by draining a fresh stream of
    # just b1 with a NEW checkpoint against the already-folded state.
    before = {
        (r.delta_id, r.match_id, r.in_corpus)
        for r in spark.read.parquet(pairs_path + "/batch_id=0").collect()
    }
    import shutil

    shutil.rmtree(index_path + "/batch_id=1")  # state as of the crash
    replay_in = str(tmp_path / "replay")
    os.makedirs(replay_in)
    b1.toPandas().to_parquet(replay_in + "/b1.parquet", index=False)
    SD.run_streaming_dedup(
        SD.read_docs_stream(spark, replay_in),
        index_path,
        pairs_path,
        str(tmp_path / "ckpt_replay"),
        threshold=0.5,
    )
    after = {
        (r.delta_id, r.match_id, r.in_corpus)
        for r in spark.read.parquet(pairs_path + "/batch_id=0").collect()
    }
    assert after == before


def test_streaming_dedup_recurring_doc_id_single_index_entry(spark, tmp_path):
    """A doc_id that legitimately recurs in a LATER micro-batch must
    not gain a second index entry (which every future probe would
    double-match against): only first occurrences fold, so the index
    holds exactly one signature per doc_id for the stream's lifetime."""
    import os
    import time as _time

    from movie_data_pipeline_spark.streaming import docs as SD

    index_path = str(tmp_path / "index")
    pairs_path = str(tmp_path / "pairs")
    stream_in = str(tmp_path / "incoming")

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    seed = spark.createDataFrame([(100, text)], ["doc_id", "text"])
    from movie_data_pipeline_spark.operators.dedup import minhash_index

    minhash_index(seed).write.parquet(index_path + "/batch_id=-1")

    os.makedirs(stream_in)
    b1 = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    # doc_id=1 recurs in the later batch, alongside a genuinely new doc
    b2 = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    b1.toPandas().to_parquet(stream_in + "/b1.parquet", index=False)
    b2.toPandas().to_parquet(stream_in + "/b2.parquet", index=False)
    base = _time.time()
    os.utime(stream_in + "/b1.parquet", (base, base))
    os.utime(stream_in + "/b2.parquet", (base + 5, base + 5))

    SD.run_streaming_dedup(
        SD.read_docs_stream(spark, stream_in),
        index_path,
        pairs_path,
        str(tmp_path / "ckpt"),
        threshold=0.5,
    )

    idx = spark.read.parquet(index_path)
    per_id = {r.doc_id: r.n for r in idx.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert per_id == {100: 1, 1: 1, 2: 1}
    # batch 2's probe reports each near-dup pair exactly once: the
    # recurring doc 1 pairs with doc 2 batch-internally (not once per
    # index copy), and each delta doc matches the corpus entry once
    got = sorted(
        (r.delta_id, r.match_id, r.in_corpus)
        for r in spark.read.parquet(pairs_path + "/batch_id=1").collect()
    )
    assert got == [(1, 2, False), (1, 100, True), (2, 100, True)]


def test_first_seen_fold_stream_equals_batch(
    spark, staged_events_dir, batch_events, tmp_path
):
    """The foreachBatch MIN-merge first-seen table must equal the
    batch groupBy-MIN over the same corpus (and so must the derived
    cumulative-unique-users curve), including after a full replay
    from a fresh checkpoint into the existing table (idempotence of
    the MIN fold)."""
    from pyspark.sql import Window

    path = str(tmp_path / "first_seen")

    def run(checkpoint: str) -> None:
        stream = spark.readStream.schema(batch_events.schema).parquet(
            staged_events_dir
        )
        SE.run_first_seen_sink(stream, path, str(tmp_path / checkpoint))

    run("ck1")
    batch_first = (
        batch_events.select(
            "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
    )
    got = {r.user_id: r.day for r in spark.read.parquet(path).collect()}
    want = {r.user_id: r.day for r in batch_first.collect()}
    assert got == want

    # replay everything from a FRESH checkpoint into the same table:
    # the MIN fold must leave it byte-equivalent
    run("ck2")
    again = {r.user_id: r.day for r in spark.read.parquet(path).collect()}
    assert again == want

    # derived growth curve == the batch cumulative formulation
    daily = (
        spark.read.parquet(path)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    curve = [
        (r.day, r.new_users, r.cum)
        for r in daily.select(
            "day", "new_users", F.sum("new_users").over(w).alias("cum")
        )
        .orderBy("day")
        .collect()
    ]
    total = curve[-1][2]
    assert total == len(want)
    assert all(c[2] == sum(x[1] for x in curve[: i + 1]) for i, c in enumerate(curve))


def test_growth_accounting_stream_equals_batch(
    spark, staged_events_dir, batch_events, tmp_path
):
    """The growth-accounting sink's published daily_new_vs_returning
    and wau_trailing_7d tables must equal the batch formulations
    (plans/analytics_ext12) over the same corpus, including after a
    full replay from a fresh checkpoint into the existing state
    (idempotence of the set-union incidence fold)."""
    incidence = str(tmp_path / "incidence")
    out = str(tmp_path / "growth")

    def run(checkpoint: str) -> None:
        stream = spark.readStream.schema(batch_events.schema).parquet(
            staged_events_dir
        )
        SE.run_growth_accounting_sink(
            stream, incidence, out, str(tmp_path / checkpoint)
        )

    run("ck1")

    du = (
        batch_events.select(
            "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
        )
        .distinct()
    )
    first = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    want_nvr = {
        r.day: (r.n_active, r.n_new, r.n_returning)
        for r in du.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum((F.col("day") == F.col("first_day")).cast("int")).alias(
                "n_new"
            ),
            F.sum((F.col("day") > F.col("first_day")).cast("int")).alias(
                "n_returning"
            ),
        )
        .collect()
    }
    days = du.select(F.col("day").alias("d")).distinct()
    want_wau = {
        r.d: r.wau
        for r in du.join(
            days,
            (F.col("day") <= F.col("d")) & (F.col("day") >= F.col("d") - 6),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .collect()
    }

    def got_tables():
        nvr = {
            r.day: (r.n_active, r.n_new, r.n_returning)
            for r in spark.read.parquet(
                out + "/daily_new_vs_returning"
            ).collect()
        }
        wau = {
            r.day: r.wau
            for r in spark.read.parquet(out + "/wau_trailing_7d").collect()
        }
        return nvr, wau

    nvr, wau = got_tables()
    assert nvr == want_nvr
    assert wau == want_wau
    # sanity: every day's actives split exactly into new + returning
    assert all(a == n + r for (a, n, r) in nvr.values())

    # full replay from a fresh checkpoint into the same state: the
    # set-union fold must leave both outputs byte-equivalent
    run("ck2")
    nvr2, wau2 = got_tables()
    assert nvr2 == want_nvr
    assert wau2 == want_wau


def test_interrupted_swap_recovers_fold_state(
    spark, staged_events_dir, batch_events, tmp_path
):
    """A crash inside _atomic_swap_parquet's only non-atomic window
    (between the two renames) leaves ``path`` missing and
    ``path__old`` holding the accumulated fold. The NEXT merge must
    restore that state before reading — the replayed input here is a
    deliberate one-user SUBSET, so without recovery the rebuilt table
    would hold exactly one user and the assertion below would fail
    (full-replay tests can't see this: replay rebuilds everything)."""
    import os

    path = str(tmp_path / "first_seen")

    stream = spark.readStream.schema(batch_events.schema).parquet(
        staged_events_dir
    )
    SE.run_first_seen_sink(stream, path, str(tmp_path / "ck1"))
    want = {r.user_id: r.day for r in spark.read.parquet(path).collect()}

    # simulate the crash window: old table renamed aside, path missing
    os.rename(path, path + "__old")

    # drain a single NEW user's event from a fresh checkpoint — a
    # subset of nothing previously seen
    one_dir = str(tmp_path / "one_event")
    (
        batch_events.limit(1)
        .withColumn("user_id", F.lit(999_999_999))
        .write.mode("overwrite")
        .parquet(one_dir)
    )
    stream2 = spark.readStream.schema(batch_events.schema).parquet(one_dir)
    SE.run_first_seen_sink(stream2, path, str(tmp_path / "ck2"))

    assert not os.path.exists(path + "__old")
    got = {r.user_id: r.day for r in spark.read.parquet(path).collect()}
    assert 999_999_999 in got
    got.pop(999_999_999)
    assert got == want  # pre-crash state recovered, not rebuilt


def test_recover_interrupted_swap_noop_when_path_exists(tmp_path):
    """Crash AFTER the second rename (path live, stale __old left):
    recovery must not touch the live table; the stale aside is the
    next swap's job to clean."""
    import os

    path = str(tmp_path / "t")
    os.makedirs(path)
    open(os.path.join(path, "marker"), "w").write("live")
    os.makedirs(path + "__old")
    SE._recover_interrupted_swap(path)
    assert os.path.exists(os.path.join(path, "marker"))
    assert os.path.exists(path + "__old")


def test_monthly_rollup_stream_equals_batch(spark, tmp_path):
    """The additive IVM sink: drain the orders corpus, compare the
    published rollup to the one-pass batch aggregate; then re-drain
    from a FRESH checkpoint (high-water mark must turn the full
    replay into a no-op — addition is not idempotent); then append a
    NEW orders file and continue under the ORIGINAL checkpoint (the
    true incremental path: only the delta merges)."""
    import os

    src = str(tmp_path / "orders_src")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.write.mode("overwrite").parquet(src)

    state = str(tmp_path / "state")
    out = str(tmp_path / "rollup")

    def want_for(df):
        rows = (
            df.groupBy(
                (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                .cast("int")
                .alias("ym")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.round(
                    F.sum(
                        F.col("o_totalprice").cast("decimal(30,2)")
                    ).cast("double"),
                    2,
                ).alias("revenue"),
            )
            .collect()
        )
        return {r.ym: (r.n_orders, r.revenue) for r in rows}

    def got():
        return {
            r.ym: (r.n_orders, r.revenue)
            for r in spark.read.parquet(out).collect()
        }

    stream = spark.readStream.schema(orders.schema).parquet(src)
    SE.run_monthly_rollup_sink(stream, state, out, str(tmp_path / "ck1"))
    assert got() == want_for(orders)

    # fresh checkpoint, same data: every batch id restarts at 0 <=
    # high-water -> skipped; a re-merge would double every count
    stream2 = spark.readStream.schema(orders.schema).parquet(src)
    SE.run_monthly_rollup_sink(stream2, state, out, str(tmp_path / "ck2"))
    assert got() == want_for(orders)

    # append a delta file; continue under the ORIGINAL checkpoint —
    # only the delta merges (IVM), and the state equals the full
    # recompute over old+new
    delta = orders.limit(37).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    delta.write.mode("append").parquet(src)
    stream3 = spark.readStream.schema(orders.schema).parquet(src)
    SE.run_monthly_rollup_sink(stream3, state, out, str(tmp_path / "ck1"))
    assert got() == want_for(spark.read.parquet(src))
    assert os.path.exists(state)


def test_streaming_kmv_stream_equals_batch(spark, tmp_path):
    """KMV sketch state folded across micro-batches is BYTE-IDENTICAL
    to the batch sketch over the same rows (the closure law, live:
    partial per batch, read-side fold), and replaying a batch whose
    partial already committed changes nothing."""
    from movie_data_pipeline_spark.operators.sketches import kmv_sketches
    from movie_data_pipeline_spark.streaming import events as SE
    from movie_data_pipeline_spark.streaming import sketches as SK

    k = 64  # saturates on sf0.001 user_ids -> estimator regime
    events = spark.read.parquet(f"{SF}/events.parquet")
    state = str(tmp_path / "state")
    stream_in = str(tmp_path / "incoming")

    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    # stage via Spark writes: pandas to_parquet stores ts as int64-ns,
    # which the fixed µs timestamp stream schema refuses to read
    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    SK.run_streaming_kmv(
        SE.read_events_stream(spark, stream_in),
        state,
        str(tmp_path / "ckpt"),
        group_col="event_type",
        key_col="user_id",
        k=k,
    )

    got = {
        r["event_type"]: (r["kmv"], r["n_kmv"], r["est_distinct"])
        for r in SK.current_sketches(spark, state, "event_type", k).collect()
    }
    want = {
        r["event_type"]: (r["kmv"], r["n_kmv"], r["est_distinct"])
        for r in kmv_sketches(events, "event_type", "user_id", k=k).collect()
    }
    assert got == want and len(got) == 5

    # replay: rewrite batch 0's partial via a fresh drain of the same
    # file into the same batch_id dir — the fold must not change
    import shutil

    pre = sorted(str(x) for x in (tmp_path / "state").rglob("batch_id=*"))
    shutil.rmtree(str(tmp_path / "ckpt"))
    only_b0 = str(tmp_path / "replay_in")
    os.makedirs(only_b0)
    _shutil.copy(f"{stream_in}/b0.parquet", f"{only_b0}/b0.parquet")
    SK.run_streaming_kmv(
        SE.read_events_stream(spark, only_b0),
        state,
        str(tmp_path / "ckpt"),
        group_col="event_type",
        key_col="user_id",
        k=k,
    )
    post = sorted(str(x) for x in (tmp_path / "state").rglob("batch_id=*"))
    assert pre == post
    again = {
        r["event_type"]: (r["kmv"], r["n_kmv"], r["est_distinct"])
        for r in SK.current_sketches(spark, state, "event_type", k).collect()
    }
    assert again == want


def test_streaming_ams_stream_equals_batch(spark, tmp_path):
    """AMS replica sums folded across micro-batches EXACTLY equal the
    batch sketch over the same rows (every sum is integer-valued, so
    the re-fold is associative without rounding) — and a replayed
    batch rewrites a byte-identical partial instead of double-counting
    (addition is NOT idempotent, so for AMS the batch_id overwrite
    layout is load-bearing, not defense-in-depth)."""
    from movie_data_pipeline_spark.operators.sketches import ams_replica_sums
    from movie_data_pipeline_spark.streaming import events as SE
    from movie_data_pipeline_spark.streaming import sketches as SK

    reps = 96  # 1.5 hash blocks: exercises the partial-width tail
    events = spark.read.parquet(f"{SF}/events.parquet")
    state = str(tmp_path / "state")
    stream_in = str(tmp_path / "incoming")

    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    SK.run_streaming_ams(
        SE.read_events_stream(spark, stream_in),
        state,
        str(tmp_path / "ckpt"),
        key_col="user_id",
        reps=reps,
    )

    got = SK.current_ams_sums(spark, state, reps).collect()[0]
    want = ams_replica_sums(events, "user_id", reps).collect()[0]
    assert got["n_rows"] == want["n_rows"]
    assert got["sums"] == want["sums"]  # exact, not approximate

    # replay batch 0 alone under a fresh checkpoint: the partial dir
    # set is unchanged and the fold still equals the batch answer
    pre = sorted(str(x) for x in (tmp_path / "state").rglob("batch_id=*"))
    only_b0 = str(tmp_path / "replay_in")
    os.makedirs(only_b0)
    _shutil.copy(f"{stream_in}/b0.parquet", f"{only_b0}/b0.parquet")
    SK.run_streaming_ams(
        SE.read_events_stream(spark, only_b0),
        state,
        str(tmp_path / "ckpt2"),
        key_col="user_id",
        reps=reps,
    )
    post = sorted(str(x) for x in (tmp_path / "state").rglob("batch_id=*"))
    assert pre == post
    again = SK.current_ams_sums(spark, state, reps).collect()[0]
    assert again["n_rows"] == want["n_rows"]
    assert again["sums"] == want["sums"]


def test_streaming_chunks_stream_equals_batch(spark, tmp_path):
    """r12 VERDICT item 8: sentence chunking gets a streaming twin.
    The streamed union of per-batch chunk outputs must equal the batch
    lateral UDTF over the same rows exactly (per-doc deterministic
    function, no cross-doc state), and a replayed batch must rewrite
    byte-equivalent partials instead of duplicating chunk rows."""
    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    from movie_data_pipeline_spark.functions import chunking
    from movie_data_pipeline_spark.plans.analytics_ext17 import (
        _BUDGET,
        _OVERLAP,
        _sentenced,
    )
    from movie_data_pipeline_spark.streaming import docs as SD

    docs = _sentenced(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).select("doc_id", F.col("sentenced").alias("text"))
    out = str(tmp_path / "chunks")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    SD.run_streaming_chunks(
        SD.read_docs_stream(spark, stream_in),
        out,
        str(tmp_path / "ckpt"),
        budget=_BUDGET,
        overlap=_OVERLAP,
    )

    got = sorted(
        tuple(r)
        for r in SD.current_chunks(spark, out).collect()
    )
    chunking.register(spark)
    docs.createOrReplaceTempView("_batch_docs")
    want = sorted(
        tuple(r)
        for r in spark.sql(
            f"""
            SELECT d.doc_id, c.chunk_idx, c.chunk, c.chunk_tokens
            FROM _batch_docs d,
                 LATERAL chunk_sentences(d.text, {_BUDGET}, {_OVERLAP}) c
            """
        ).collect()
    )
    assert got == want and len(got) > 0

    # replay batch 0 under a fresh checkpoint: partial dir set
    # unchanged, union unchanged (per-doc determinism = replay safety)
    pre = sorted(str(x) for x in (tmp_path / "chunks").rglob("batch_id=*"))
    only_b0 = str(tmp_path / "replay_in")
    os.makedirs(only_b0)
    _shutil.copy(f"{stream_in}/b0.parquet", f"{only_b0}/b0.parquet")
    SD.run_streaming_chunks(
        SD.read_docs_stream(spark, only_b0),
        out,
        str(tmp_path / "ckpt2"),
        budget=_BUDGET,
        overlap=_OVERLAP,
    )
    post = sorted(str(x) for x in (tmp_path / "chunks").rglob("batch_id=*"))
    assert pre == post
    again = sorted(tuple(r) for r in SD.current_chunks(spark, out).collect())
    assert again == want


def test_atomic_partial_write_crash_windows(spark, tmp_path):
    """r12 ADVICE item 4: a crash mid-write must never expose a
    truncated partial to the read-side fold — AMS merges by ADDITION,
    so a half-written partial silently corrupts the current sums until
    the replay. _atomic_partial_write stages to a dot-prefixed sibling
    and renames into place; this pins all three crash windows plus the
    read-side invisibility of a leftover stage."""
    import os

    from movie_data_pipeline_spark.streaming.sketches import (
        _atomic_partial_write,
    )

    state = tmp_path / "state"
    df = spark.range(5).selectExpr("id AS n", "array(id * 1.0) AS sums")

    # normal publish
    _atomic_partial_write(df, str(state), 0)
    assert (state / "batch_id=0").is_dir()
    assert not (state / ".stage_batch_id=0").exists()

    # crash window A: a prior attempt died mid-STAGE-write, leaving a
    # garbage stage dir — the replayed publish must heal it
    stale = state / ".stage_batch_id=1"
    stale.mkdir(parents=True)
    (stale / "part-00000.parquet").write_bytes(b"PAR1truncated")
    _atomic_partial_write(df, str(state), 1)
    assert (state / "batch_id=1").is_dir()
    assert not stale.exists()

    # crash window B: a pre-fix deployment left a TRUNCATED published
    # partial — the replay's publish atomically replaces it
    broken = state / "batch_id=2"
    broken.mkdir()
    (broken / "part-00000.parquet").write_bytes(b"PAR1truncated")
    _atomic_partial_write(df, str(state), 2)
    got = spark.read.parquet(str(state / "batch_id=2"))
    assert got.count() == 5

    # read-side: a leftover stage dir (crash between stage-write and
    # rename) is invisible to partition discovery — the fold reads
    # only published batch_id=N partials
    leftover = state / ".stage_batch_id=9"
    leftover.mkdir()
    (leftover / "part-00000.parquet").write_bytes(b"not parquet at all")
    all_rows = spark.read.parquet(str(state))
    assert all_rows.count() == 15  # 3 published batches x 5 rows
    assert sorted(all_rows.select("batch_id").distinct().toPandas()["batch_id"]) == [0, 1, 2]
    assert os.path.isdir(leftover)  # untouched, awaiting its replay


def test_streaming_sentence_index_equals_batch(spark, tmp_path):
    """r13 VERDICT item 7: dup_sentence_stats is cross-doc stateful,
    so its streaming analog persists a per-batch (doc_id, k, cnt)
    index and folds read-side. The fold over three micro-batches must
    equal the batch registry entry exactly (docs with >= 1 sentence —
    the index never sees sentence-less docs), and a replayed batch
    must rewrite byte-equivalent partials instead of double-counting."""
    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    from movie_data_pipeline_spark.plans.analytics_ext19 import (
        dup_sentence_stats,
    )
    from movie_data_pipeline_spark.streaming import docs as SD

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    index = str(tmp_path / "sent_index")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    SD.run_streaming_sentence_index(
        SD.read_docs_stream(spark, stream_in), index, str(tmp_path / "ckpt")
    )

    got = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )
    want = sorted(
        tuple(r)
        for r in dup_sentence_stats(spark, SF)
        .filter(F.col("n_sentences") > 0)
        .collect()
    )
    assert got == want and len(got) > 0

    # replay batch 0 under a fresh checkpoint: partial dir set
    # unchanged, fold unchanged (hash-deterministic partials)
    pre = sorted(
        str(x) for x in (tmp_path / "sent_index").rglob("batch_id=*")
    )
    only_b0 = str(tmp_path / "replay_in")
    os.makedirs(only_b0)
    _shutil.copy(f"{stream_in}/b0.parquet", f"{only_b0}/b0.parquet")
    SD.run_streaming_sentence_index(
        SD.read_docs_stream(spark, only_b0), index, str(tmp_path / "ckpt2")
    )
    post = sorted(
        str(x) for x in (tmp_path / "sent_index").rglob("batch_id=*")
    )
    assert pre == post
    again = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )
    assert again == want


def test_atomic_partial_write_tombstone_windows(spark, tmp_path):
    """r13 ADVICE item 2: the replace path must never DELETE the
    published partial before its replacement is ready — the old
    rmtree-then-rename order left the partial missing for a whole
    O(files) delete, which a concurrent current_* reader would fold
    as a silent under-sum. Now the stale partial is renamed to a
    dot-prefixed tombstone (one syscall), the stage renamed into
    place (one syscall), and the tombstone deleted last. Pins the
    tombstone crash windows."""
    import os

    from movie_data_pipeline_spark.streaming.sketches import (
        _atomic_partial_write,
    )

    state = tmp_path / "state"
    df = spark.range(4).selectExpr("id AS n", "array(id * 1.0) AS sums")

    # crash window: a predecessor died between the two renames —
    # tombstone present, final absent. The replay must heal both.
    tomb = state / ".tomb_batch_id=0"
    tomb.mkdir(parents=True)
    (tomb / "part-00000.parquet").write_bytes(b"PAR1stale")
    _atomic_partial_write(df, str(state), 0)
    assert (state / "batch_id=0").is_dir()
    assert not tomb.exists()

    # crash window: died after the stage rename but before the
    # tombstone sweep — both final and tombstone present. The replay
    # rewrites and sweeps.
    tomb1 = state / ".tomb_batch_id=1"
    _atomic_partial_write(df, str(state), 1)
    tomb1.mkdir()
    (tomb1 / "part-00000.parquet").write_bytes(b"PAR1stale")
    _atomic_partial_write(df, str(state), 1)
    assert spark.read.parquet(str(state / "batch_id=1")).count() == 4
    assert not tomb1.exists()

    # a dot-prefixed tombstone is invisible to the read-side fold
    tomb2 = state / ".tomb_batch_id=7"
    tomb2.mkdir()
    (tomb2 / "part-00000.parquet").write_bytes(b"not parquet")
    assert spark.read.parquet(str(state)).count() == 8


def test_sentence_index_compaction(spark, tmp_path):
    """r14 compaction surface: fold all sentence-index partials into
    the single batch_id=-1 base partial — stats unchanged, directory
    count 1 — and a LATER drain under the same checkpoint folds on
    top of the compacted base correctly."""
    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    from movie_data_pipeline_spark.plans.analytics_ext19 import (
        dup_sentence_stats,
    )
    from movie_data_pipeline_spark.streaming import docs as SD
    from movie_data_pipeline_spark.streaming.compaction import (
        compact_sentence_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    index = str(tmp_path / "idx")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    # drain batches 0 and 1 only, then compact, then drain batch 2
    held_back = str(tmp_path / "b2.parquet")
    os.rename(f"{stream_in}/b2.parquet", held_back)
    SD.run_streaming_sentence_index(
        SD.read_docs_stream(spark, stream_in), index, str(tmp_path / "ckpt")
    )
    want_partial = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )

    compact_sentence_index(spark, index)
    dirs = sorted(x.name for x in (tmp_path / "idx").glob("batch_id=*"))
    assert dirs == ["batch_id=-1"]
    assert not (tmp_path / "idx__old").exists()
    assert not (tmp_path / "idx__staged").exists()
    got = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )
    assert got == want_partial

    # the next drain (same checkpoint) folds on top of the base
    os.rename(held_back, f"{stream_in}/b2.parquet")
    SD.run_streaming_sentence_index(
        SD.read_docs_stream(spark, stream_in), index, str(tmp_path / "ckpt")
    )
    full = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )
    want_full = sorted(
        tuple(r)
        for r in dup_sentence_stats(spark, SF)
        .filter(F.col("n_sentences") > 0)
        .collect()
    )
    assert full == want_full


def test_kmv_and_ams_compaction(spark, tmp_path):
    """Compacted KMV and AMS state folds to the identical current
    values (closure under their own merges)."""
    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    from movie_data_pipeline_spark.streaming import events as SE
    from movie_data_pipeline_spark.streaming import sketches as SK
    from movie_data_pipeline_spark.streaming.compaction import (
        compact_ams_state,
        compact_kmv_state,
    )

    k, reps = 64, 40
    events = spark.read.parquet(f"{SF}/events.parquet")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    kmv_state = str(tmp_path / "kmv")
    SK.run_streaming_kmv(
        SE.read_events_stream(spark, stream_in),
        kmv_state,
        str(tmp_path / "ck1"),
        group_col="event_type",
        key_col="user_id",
        k=k,
    )
    want_kmv = sorted(
        tuple(r)
        for r in SK.current_sketches(
            spark, kmv_state, "event_type", k
        ).collect()
    )
    compact_kmv_state(spark, kmv_state, "event_type", k)
    assert sorted(
        x.name for x in (tmp_path / "kmv").glob("batch_id=*")
    ) == ["batch_id=-1"]
    got_kmv = sorted(
        tuple(r)
        for r in SK.current_sketches(
            spark, kmv_state, "event_type", k
        ).collect()
    )
    assert got_kmv == want_kmv

    ams_state = str(tmp_path / "ams")
    SK.run_streaming_ams(
        SE.read_events_stream(spark, stream_in),
        ams_state,
        str(tmp_path / "ck2"),
        key_col="user_id",
        reps=reps,
    )
    want_ams = SK.current_ams_sums(spark, ams_state, reps).collect()
    compact_ams_state(spark, ams_state, reps)
    assert sorted(
        x.name for x in (tmp_path / "ams").glob("batch_id=*")
    ) == ["batch_id=-1"]
    got_ams = SK.current_ams_sums(spark, ams_state, reps).collect()
    assert got_ams == want_ams


def test_compaction_crash_recovery(spark, tmp_path):
    """The swap's only crash window (state root renamed aside, staged
    not yet in place) is healed by the recovery rename at the top of
    every current_* read and of the next compaction; a leftover
    staged root is swept."""
    import os

    from movie_data_pipeline_spark.streaming import docs as SD
    from movie_data_pipeline_spark.streaming.compaction import (
        compact_sentence_index,
    )
    from movie_data_pipeline_spark.streaming.sketches import (
        _atomic_partial_write,
    )

    index = str(tmp_path / "idx")
    part = spark.createDataFrame(
        [(1, 11, 2), (2, 11, 1), (2, 22, 1)], ["doc_id", "k", "cnt"]
    )
    _atomic_partial_write(part, index, 0)
    want = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )
    assert want == [(1, 2, 2, 1.0), (2, 2, 1, 0.5)]

    # simulate the crash window: root renamed aside, nothing in place
    os.rename(index, index + "__old")
    got = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )
    assert got == want  # reader restored the root

    # a stale staged root from a crashed fold must not poison the swap
    os.makedirs(index + "__staged/batch_id=-1")
    with open(index + "__staged/batch_id=-1/junk", "w") as f:
        f.write("not parquet")
    compact_sentence_index(spark, index)
    assert sorted(
        x.name for x in (tmp_path / "idx").glob("batch_id=*")
    ) == ["batch_id=-1"]
    again = sorted(
        tuple(r)
        for r in SD.current_dup_sentence_stats(spark, index).collect()
    )
    assert again == want


def test_minhash_index_compaction(spark, tmp_path):
    """Minhash index compaction rewrites the signature union as the
    single base partial — row set unchanged."""
    from movie_data_pipeline_spark.operators.dedup import minhash_index
    from movie_data_pipeline_spark.streaming.compaction import (
        compact_minhash_index,
    )
    from movie_data_pipeline_spark.streaming.sketches import (
        _atomic_partial_write,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = minhash_index(docs)
    state = str(tmp_path / "mh")
    _atomic_partial_write(
        idx.filter(F.col("doc_id") % 2 == 0), state, 0
    )
    _atomic_partial_write(
        idx.filter(F.col("doc_id") % 2 == 1), state, 1
    )
    want = (
        spark.read.parquet(state)
        .select("doc_id", "sh", "bands")
        .sort("doc_id")
        .collect()
    )
    compact_minhash_index(spark, state)
    assert sorted(
        x.name for x in (tmp_path / "mh").glob("batch_id=*")
    ) == ["batch_id=-1"]
    got = (
        spark.read.parquet(state)
        .select("doc_id", "sh", "bands")
        .sort("doc_id")
        .collect()
    )
    assert got == want and len(got) == docs.count()


def test_state_write_lock_excludes_overlap(spark, tmp_path):
    """r14 ADVICE item enforced: a compaction attempted while a LIVE
    pid holds the root's writer lock raises instead of swapping (the
    silent-loss overlap); a drain refuses under the same condition;
    a DEAD holder's lock is broken and the operation proceeds; locks
    are released on exit."""
    import os
    import subprocess

    import pytest

    from movie_data_pipeline_spark.streaming import sketches as SK
    from movie_data_pipeline_spark.streaming.compaction import (
        compact_sentence_index,
    )
    from movie_data_pipeline_spark.streaming.events import (
        read_events_stream,
        state_write_lock,
    )

    index = str(tmp_path / "idx")
    part = spark.createDataFrame(
        [(1, 11, 2), (2, 11, 1)], ["doc_id", "k", "cnt"]
    )
    SK._atomic_partial_write(part, index, 0)

    # live holder (this very process counts: the lock is deliberately
    # non-reentrant — compact-inside-drain IS the forbidden overlap)
    with open(index + ".lock", "w") as fh:
        fh.write(f"{os.getpid()} drain")
    with pytest.raises(RuntimeError, match="locked by live pid"):
        compact_sentence_index(spark, index)
    assert os.path.exists(index + ".lock")  # foreign lock untouched

    # a drain refuses the same way, before writing anything
    events = spark.read.parquet(f"{SF}/events.parquet").limit(10)
    stream_in = str(tmp_path / "incoming")
    events.coalesce(1).write.parquet(stream_in)
    kmv_state = str(tmp_path / "kmv")
    os.makedirs(kmv_state)
    with open(kmv_state + ".lock", "w") as fh:
        fh.write(f"{os.getpid()} compaction")
    with pytest.raises(RuntimeError, match="locked by live pid"):
        SK.run_streaming_kmv(
            read_events_stream(spark, stream_in),
            kmv_state,
            str(tmp_path / "ck"),
            group_col="event_type",
            key_col="user_id",
            k=16,
        )
    assert list((tmp_path / "kmv").glob("batch_id=*")) == []
    os.unlink(kmv_state + ".lock")

    # dead holder: lock broken, compaction proceeds, lock released
    p = subprocess.Popen(["true"])
    p.wait()
    with open(index + ".lock", "w") as fh:
        fh.write(f"{p.pid} drain")
    compact_sentence_index(spark, index)
    assert not os.path.exists(index + ".lock")
    assert sorted(
        x.name for x in (tmp_path / "idx").glob("batch_id=*")
    ) == ["batch_id=-1"]

    # the context manager releases on exceptions too
    with pytest.raises(ValueError):
        with state_write_lock(index, "drain"):
            assert os.path.exists(index + ".lock")
            raise ValueError("boom")
    assert not os.path.exists(index + ".lock")


def test_recover_skips_under_live_foreign_lock(tmp_path):
    """Reader-side recovery must NOT rename __old back while another
    LIVE pid is mid-swap on the root (it would collide with the
    holder's second rename); with no lock — or a dead holder's — the
    restore happens."""
    import os
    import subprocess

    from movie_data_pipeline_spark.streaming.events import (
        _recover_interrupted_swap,
    )

    root = str(tmp_path / "state")
    os.makedirs(root + "__old")

    # live foreign holder (pid 1 is alive and never us): hands off
    with open(root + ".lock", "w") as fh:
        fh.write("1 compaction")
    _recover_interrupted_swap(root)
    assert not os.path.exists(root) and os.path.exists(root + "__old")

    # dead holder: stale lock does not suppress recovery
    p = subprocess.Popen(["true"])
    p.wait()
    with open(root + ".lock", "w") as fh:
        fh.write(f"{p.pid} compaction")
    _recover_interrupted_swap(root)
    assert os.path.exists(root) and not os.path.exists(root + "__old")


def test_streaming_bloom_stream_equals_batch(spark, tmp_path):
    """Round-14 streaming Bloom maintenance: the folded bitmap is
    BYTE-IDENTICAL to the batch build over the same docs; a full
    replay (fresh checkpoint, same files) leaves it unchanged —
    bit_or is idempotent, the strongest closure law in the family;
    compaction folds to one base partial with the bitmap intact; and
    the folded filter serves the actual probe (flagged docs match
    the batch operator end-to-end)."""
    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    from movie_data_pipeline_spark.operators.decontam import (
        _gram_hashes,
        bloom_bitmap,
        bloom_decontamination,
    )
    from movie_data_pipeline_spark.streaming import docs as SD
    from movie_data_pipeline_spark.streaming.compaction import (
        compact_bloom_state,
    )

    N, M, K = 8, 1 << 16, 7
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)

    state = str(tmp_path / "bloom")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        bench.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    SD.run_streaming_bloom(
        SD.read_docs_stream(spark, stream_in),
        state,
        str(tmp_path / "ckpt"),
        n=N,
        m_bits=M,
        k=K,
    )
    assert not os.path.exists(state + ".lock")  # released post-drain

    want = sorted(
        tuple(r)
        for r in bloom_bitmap(
            _gram_hashes(bench, "bench_id", N, "doc_id", "text").select(
                "ng"
            ),
            M,
            K,
        ).collect()
    )
    got = sorted(
        tuple(r) for r in SD.current_bloom_bitmap(spark, state).collect()
    )
    assert got == want and len(want) > 0

    # idempotence: replay EVERYTHING under a fresh checkpoint — the
    # folded bitmap cannot change (same bits set twice)
    SD.run_streaming_bloom(
        SD.read_docs_stream(spark, stream_in),
        state,
        str(tmp_path / "ckpt2"),
        n=N,
        m_bits=M,
        k=K,
    )
    again = sorted(
        tuple(r) for r in SD.current_bloom_bitmap(spark, state).collect()
    )
    assert again == want

    compact_bloom_state(spark, state)
    assert sorted(
        x.name for x in (tmp_path / "bloom").glob("batch_id=*")
    ) == ["batch_id=-1"]
    folded = SD.current_bloom_bitmap(spark, state)
    assert sorted(tuple(r) for r in folded.collect()) == want

    # the streamed filter drives the real probe: same flagged docs as
    # the batch operator over the same reference set
    want_docs = sorted(
        tuple(r)
        for r in bloom_decontamination(
            train, bench, n=N, m_bits=M, k=K
        ).collect()
    )
    got_docs = sorted(
        tuple(r)
        for r in bloom_decontamination(
            train, None, n=N, m_bits=M, k=K, bitmap=folded
        ).collect()
    )
    assert got_docs == want_docs and len(got_docs) > 0

    # parameter pin: a drain under different (n, m, k) must refuse —
    # folding mixed-parameter partials corrupts the filter silently
    import pytest

    with pytest.raises(ValueError, match="silently corrupt"):
        SD.run_streaming_bloom(
            SD.read_docs_stream(spark, stream_in),
            state,
            str(tmp_path / "ckpt3"),
            n=N,
            m_bits=M * 2,
            k=K,
        )


def test_streaming_cms_stream_equals_batch(spark, tmp_path):
    """Round-14 streaming count-min: the folded cell sketch is
    BYTE-IDENTICAL to the batch build over the same rows (per-cell
    addition is exact integer arithmetic); compaction folds to the
    single base partial with estimates intact; the params sidecar
    refuses a mismatched drain."""
    import os
    import shutil as _shutil
    import time as _time
    from pathlib import Path as _Path

    import pytest

    from movie_data_pipeline_spark.operators.sketches import (
        cms_estimates,
        cms_sketch,
    )
    from movie_data_pipeline_spark.streaming import events as SE
    from movie_data_pipeline_spark.streaming import sketches as SK
    from movie_data_pipeline_spark.streaming.compaction import (
        compact_cms_state,
    )

    W, D = 1024, 5
    ev = spark.read.parquet(f"{SF}/events.parquet")
    stream_in = str(tmp_path / "incoming")
    os.makedirs(stream_in)
    base = _time.time()
    for i in range(3):
        stage = str(tmp_path / f"stage{i}")
        ev.filter(F.col("user_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        p = f"{stream_in}/b{i}.parquet"
        _shutil.copy(next(_Path(stage).glob("part-*.parquet")), p)
        os.utime(p, (base + 5 * i, base + 5 * i))

    state = str(tmp_path / "cms")
    SK.run_streaming_cms(
        SE.read_events_stream(spark, stream_in),
        state,
        str(tmp_path / "ckpt"),
        key_col="user_id",
        width=W,
        depth=D,
    )
    want = sorted(
        tuple(r) for r in cms_sketch(ev, "user_id", W, D).collect()
    )
    got = sorted(tuple(r) for r in SK.current_cms(spark, state).collect())
    assert got == want and len(want) > 0

    compact_cms_state(spark, state)
    assert sorted(
        x.name for x in (tmp_path / "cms").glob("batch_id=*")
    ) == ["batch_id=-1"]
    folded = SK.current_cms(spark, state)
    assert sorted(tuple(r) for r in folded.collect()) == want

    # the folded sketch estimates correctly: never under the true
    # per-user counts
    probes = ev.select("user_id").distinct().limit(50)
    true = {
        r.user_id: r.c
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in cms_estimates(folded, probes, "user_id", W, D).collect():
        assert r.est >= true.get(r.user_id, 0)

    with pytest.raises(ValueError, match="silently corrupt"):
        SK.run_streaming_cms(
            SE.read_events_stream(spark, stream_in),
            state,
            str(tmp_path / "ckpt2"),
            key_col="user_id",
            width=W * 2,
            depth=D,
        )


def test_cached_index_parts_mtime_keyed(spark, tmp_path):
    """r15: the per-partition index cache must (a) serve unchanged
    dirs from the SAME persisted DataFrame (no re-read), (b) re-read a
    dir whose mtime moved (replay rewrite), (c) evict dirs that
    vanished (compaction swap), and (d) always equal the plain
    root-read with the batch_id filter."""
    import os
    import shutil

    from movie_data_pipeline_spark.operators.dedup import minhash_index
    from movie_data_pipeline_spark.streaming import docs as SD

    root = str(tmp_path / "index")
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d1 = spark.createDataFrame([(1, t)], ["doc_id", "text"])
    d2 = spark.createDataFrame([(2, t)], ["doc_id", "text"])
    d3 = spark.createDataFrame([(3, t)], ["doc_id", "text"])
    minhash_index(d1).write.parquet(root + "/batch_id=-1")
    minhash_index(d2).write.parquet(root + "/batch_id=0")

    def ids(df):
        return sorted(r.doc_id for r in df.select("doc_id").collect())

    got = SD._cached_index_parts(spark, root, exclude_batch_id=99)
    assert ids(got) == [1, 2]
    key = (spark.sparkContext.applicationId, root)
    cache = SD._INDEX_PART_CACHE[key]
    handles = {n: id(df) for n, (_, df) in cache.items()}
    assert set(handles) == {"batch_id=-1", "batch_id=0"}

    # (a) unchanged dirs: same persisted handles, no re-read
    got2 = SD._cached_index_parts(spark, root, exclude_batch_id=99)
    assert ids(got2) == [1, 2]
    assert {n: id(df) for n, (_, df) in cache.items()} == handles

    # exclusion by dir name (the probe's replay guard)
    assert ids(SD._cached_index_parts(spark, root, exclude_batch_id=0)) == [1]

    # (b) mtime moved (at-least-once replay rewrote the fold): re-read
    shutil.rmtree(root + "/batch_id=0")
    minhash_index(d3.withColumn("doc_id", F.lit(2) * 0 + 3)).write.parquet(
        root + "/batch_id=0"
    )
    os.utime(root + "/batch_id=0")
    got3 = SD._cached_index_parts(spark, root, exclude_batch_id=99)
    assert ids(got3) == [1, 3]
    assert id(cache["batch_id=0"][1]) != handles["batch_id=0"]
    assert id(cache["batch_id=-1"][1]) == handles["batch_id=-1"]

    # (c) vanished dir (compaction swap): evicted
    shutil.rmtree(root + "/batch_id=-1")
    got4 = SD._cached_index_parts(spark, root, exclude_batch_id=99)
    assert ids(got4) == [3]
    assert set(cache) == {"batch_id=0"}

    # (d) equals the plain root read
    plain = spark.read.parquet(root).select("doc_id", "sh", "bands")
    assert ids(got4) == sorted(r.doc_id for r in plain.collect())

    # empty / missing root: None
    assert SD._cached_index_parts(
        spark, str(tmp_path / "nope"), exclude_batch_id=0
    ) is None


def test_cached_index_parts_bound_disables_cache(spark, tmp_path):
    """r15 review fix: past _INDEX_CACHE_MAX_DIRS partition dirs the
    cache disables itself (returns None, unpersists everything) — the
    measured crossover where a union of many tiny cached partitions
    loses to the packed whole-root scan, and the cap on pinned
    executor storage."""
    from movie_data_pipeline_spark.operators.dedup import minhash_index
    from movie_data_pipeline_spark.streaming import docs as SD

    root = str(tmp_path / "index")
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    n = SD._INDEX_CACHE_MAX_DIRS
    for i in range(n):
        minhash_index(
            spark.createDataFrame([(i, t)], ["doc_id", "text"])
        ).write.parquet(root + f"/batch_id={i}")
    got = SD._cached_index_parts(spark, root, exclude_batch_id=999)
    assert got is not None and got.count() == n
    key = (spark.sparkContext.applicationId, root)
    assert len(SD._INDEX_PART_CACHE[key]) == n
    # one dir past the bound: cache drops out entirely
    minhash_index(
        spark.createDataFrame([(n, t)], ["doc_id", "text"])
    ).write.parquet(root + f"/batch_id={n}")
    assert SD._cached_index_parts(spark, root, exclude_batch_id=999) is None
    assert key not in SD._INDEX_PART_CACHE
