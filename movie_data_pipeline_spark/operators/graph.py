"""PageRank by power iteration — the second iterative-fixpoint
operator family beside connected components (``dedup.py::
duplicate_clusters``), with the same execution discipline: the driver
loop iterates ROUNDS (a fixed, small count), every round is pure
DataFrame algebra (one rank⋈edges shuffle + one groupBy(dst) shuffle),
and ``localCheckpoint`` cuts lineage each round so plans don't
snowball across iterations.

Semantics: standard damped PageRank on a directed edge list,
``r' = (1−d) + d·(Σ_in contrib + dangling_mass/N)`` with ranks summing
to N (node-count normalization, the convention where an isolated node
scores exactly 1). Dangling mass (rank parked on nodes with no
out-edges) is redistributed uniformly each round, so Σ ranks = N is an
INVARIANT in exact arithmetic — the conservation law the verification
gate pins, floats allowed a 1e-6·N tolerance.

Scale posture: ranks and degrees are (node, value) tables partitioned
by node; edges shuffle once per round on src then once on dst — the
exact shape of the CC rounds, linear in |E| per iteration. The only
driver-visible values are 1-row aggregates (the dangling mass), joined
back with the established bounded crossJoin pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Ranks for every node appearing in ``edges`` (either endpoint),
    after ``n_iter`` synchronous power-iteration rounds from the
    uniform start (rank 1 per node). Returns (node, rank).

    Parallel edges are legitimate weight (each contributes its own
    share); callers wanting simple-graph semantics should distinct()
    the edge list first.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")

    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # degree-annotated node table, reused every round (deg NULL = dangling)
    base = nodes.join(out_deg, nodes.node == out_deg.src, "left").select(
        "node", "deg"
    ).localCheckpoint()
    n_nodes = base.count()  # bounded driver scalar (a count, not data)

    ranks = base.select("node", F.lit(1.0).alias("rank"), "deg")
    for _ in range(n_iter):
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        contrib = (
            ranks.join(e, ranks.node == e.src)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .crossJoin(dangling)  # 1-row side: the bounded pattern
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
                "deg",
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")
