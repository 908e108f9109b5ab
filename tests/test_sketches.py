"""KMV bottom-k distinct sketches (operators/sketches.py): exact
regime, the mergeable-state closure law, salt-tournament invariance,
and the error-bound gate at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_pipeline_spark.operators.sketches import (
    kmv_estimate_expr,
    kmv_merge_expr,
    kmv_overlap,
    kmv_sketches,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_unsaturated_sketch_is_exact(spark):
    """Fewer distinct keys than k: the sketch IS the distinct hash set
    and the estimate is the exact count."""
    orders = _orders(spark)
    sk = kmv_sketches(orders, "o_orderpriority", "o_custkey", k=4096)
    exact = (
        orders.select("o_orderpriority", "o_custkey")
        .distinct()
        .groupBy("o_orderpriority")
        .count()
    )
    rows = {
        r["o_orderpriority"]: r
        for r in sk.join(exact, "o_orderpriority").collect()
    }
    assert rows
    for r in rows.values():
        assert r["n_kmv"] == r["count"]
        assert r["est_distinct"] == float(r["count"])
        assert r["kmv"] == sorted(r["kmv"])


def test_merge_law(spark):
    """bottom-k(A ∪ B) computed from the two sketches alone equals the
    sketch built on the physical union — KMV's partial-aggregate
    closure property, with k small enough to saturate."""
    orders = _orders(spark)
    k = 64
    a_rows = orders.filter(F.col("o_orderkey") % 2 == 0)
    b_rows = orders.filter(F.col("o_orderkey") % 2 == 1)
    tag = F.lit("all").alias("g")
    sk_a = kmv_sketches(a_rows.select(tag, "o_custkey"), "g", "o_custkey", k=k)
    sk_b = kmv_sketches(b_rows.select(tag, "o_custkey"), "g", "o_custkey", k=k)
    merged = (
        sk_a.select(F.col("kmv").alias("kmv_a"))
        .crossJoin(sk_b.select(F.col("kmv").alias("kmv_b")))  # 1x1 rows
        .select(kmv_merge_expr(F.col("kmv_a"), F.col("kmv_b"), k).alias("kmv"))
        .collect()[0]["kmv"]
    )
    direct = (
        kmv_sketches(orders.select(tag, "o_custkey"), "g", "o_custkey", k=k)
        .collect()[0]["kmv"]
    )
    assert merged == direct
    assert len(direct) == k  # saturated, estimator regime exercised


def test_salt_tournament_invariance(spark):
    """The two-level (group, salt) tournament is a pure execution
    strategy: any salt_buckets setting yields the identical sketch."""
    orders = _orders(spark)
    base = kmv_sketches(
        orders, "o_orderpriority", "o_custkey", k=32, salt_buckets=1
    ).orderBy("o_orderpriority")
    salted = kmv_sketches(
        orders, "o_orderpriority", "o_custkey", k=32, salt_buckets=32
    ).orderBy("o_orderpriority")
    assert [r.asDict() for r in base.collect()] == [
        r.asDict() for r in salted.collect()
    ]


def test_saturated_estimate_within_bound(spark):
    """k=64 saturates on sf0.001 custkeys; the estimate must land
    within 4x the theoretical rse of the exact distinct count."""
    orders = _orders(spark)
    k = 64
    sk = kmv_sketches(
        orders.select(F.lit("all").alias("g"), "o_custkey"), "g", "o_custkey", k=k
    ).collect()[0]
    exact = orders.select("o_custkey").distinct().count()
    assert sk["n_kmv"] == k
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(sk["est_distinct"] - exact) / exact <= 4 * rse


def test_overlap_gate_green_at_sf0001(spark):
    """The registry gate's booleans all hold at sf0.001 (exact regime
    there — sf0.01/sf0.1 exercise saturation via the oracle runs)."""
    from movie_data_pipeline_spark.plans.analytics_ext16 import kmv_overlap_check

    rows = kmv_overlap_check(spark, SF).collect()
    assert len(rows) == 10  # C(5 priorities, 2)
    for r in rows:
        assert r["distinct_in_bound"] and r["union_in_bound"] and r["inter_in_bound"], r


def test_overlap_pairs_shape(spark):
    orders = _orders(spark)
    sk = kmv_sketches(orders, "o_orderpriority", "o_custkey", k=128)
    out = kmv_overlap(sk, "o_orderpriority", k=128).collect()
    assert len(out) == 10
    for r in out:
        assert r["g_a"] < r["g_b"]
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert r["est_intersection"] <= r["est_union"] + 1e-9


def test_ams_f2_planted(spark):
    """Planted frequencies: key i appears i times (i=1..20), so
    F2 = sum i^2 = 2870; the estimate must land inside the 2-sigma
    mean-of-32 bound (0.5 * F2)."""
    from movie_data_pipeline_spark.operators.sketches import ams_f2_estimate

    rows = [(i,) for i in range(1, 21) for _ in range(i)]
    df = spark.createDataFrame(rows, ["k"])
    got = ams_f2_estimate(df, "k").collect()[0]
    exact = sum(i * i for i in range(1, 21))
    assert got["n_rows"] == len(rows)
    assert abs(got["est_f2"] - exact) <= 0.5 * exact


def test_ams_join_size_planted(spark):
    """A: keys 1..10 x3, B: keys 6..15 x2 -> exact join 5*3*2 = 30;
    estimate inside 2*sqrt(2*F2a*F2b/32)."""
    import math

    from movie_data_pipeline_spark.operators.sketches import (
        ams_join_size_estimate,
    )

    a = spark.createDataFrame([(i,) for i in range(1, 11) for _ in range(3)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(6, 16) for _ in range(2)], ["k"])
    got = ams_join_size_estimate(a, "k", b, "k").collect()[0]
    assert (got["n_a"], got["n_b"]) == (30, 20)
    f2a, f2b = 10 * 9, 10 * 4
    bound = 2 * math.sqrt(2 * f2a * f2b / 32)
    assert abs(got["est_join_rows"] - 30) <= bound


def test_ams_sketch_is_mergeable(spark):
    """The replica sums are plain SUMs, so sketching a union equals
    adding the two partial sketches; and the numpy bit-unpack hot path
    (ams_replica_sums) must agree BIT-FOR-BIT with the pure-Column
    sign derivation (ams_z_columns) — numpy's arithmetic >> on int64
    is Spark's shiftright."""
    from movie_data_pipeline_spark.operators.sketches import (
        ams_replica_sums,
        ams_z_columns,
    )

    orders = _orders(spark)
    reps = 32 * 5
    half1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    half2 = orders.filter(F.col("o_orderkey") % 2 == 1)

    def sums(df):
        row = ams_replica_sums(df, "o_custkey", reps).collect()[0]
        return row["sums"]

    s1, s2, s_all = sums(half1), sums(half2), sums(orders)
    assert [a + b for a, b in zip(s1, s2)] == s_all

    zs = ams_z_columns(F.col("o_custkey"), reps)
    jvm_row = orders.agg(
        *[F.sum(z).alias(f"s{r}") for r, z in enumerate(zs)]
    ).collect()[0]
    assert [jvm_row[f"s{r}"] for r in range(reps)] == s_all

    # r12 disjoint-seed mode (block_bits = mean_group, r11 ADVICE):
    # the numpy unpack must track the Column derivation there too,
    # and the layout genuinely differs from the 64-bit packing
    s32 = ams_replica_sums(orders, "o_custkey", reps, block_bits=32)
    s32 = s32.collect()[0]["sums"]
    zs32 = ams_z_columns(F.col("o_custkey"), reps, block_bits=32)
    jvm32 = orders.agg(
        *[F.sum(z).alias(f"s{r}") for r, z in enumerate(zs32)]
    ).collect()[0]
    assert [jvm32[f"s{r}"] for r in range(reps)] == s32
    assert s32 != s_all


def test_ams_empty_input_is_additive_identity(spark):
    """The distributed merge must return (0, zeros(reps)) on empty
    input, NOT (null, []) — an empty array would NULL-pad through
    zip_with and poison ams_join_size_estimate when one side has no
    rows (r12 review finding)."""
    from movie_data_pipeline_spark.operators.sketches import (
        ams_join_size_estimate,
        ams_replica_sums,
    )

    orders = _orders(spark)
    empty = orders.filter(F.lit(False))
    row = ams_replica_sums(empty, "o_custkey", 64).collect()[0]
    assert row["n_rows"] == 0
    assert row["sums"] == [0.0] * 64

    est = ams_join_size_estimate(empty, "o_custkey", orders, "o_custkey")
    r = est.collect()[0]
    assert (r["n_a"], r["est_join_rows"]) == (0, 0.0)  # not NULL
