"""Edit-distance fuzzy join via SymSpell deletion neighborhoods.

The scalable exact algorithm for small-threshold Levenshtein joins
(Garbe's SymSpell; also FastSS, Bocek et al. '07): every string
generates all variants reachable by deleting up to k characters
(O(L^k) per string, tiny for short strings); two strings within
Levenshtein distance d share a common deletion ancestor with i
deletions on one side and j on the other, i ≤ d and j ≤ d — each
substitution deletes one char from BOTH sides, each insert/delete
from ONE — so a depth-k neighborhood self-join has exact recall for
d ≤ k. Candidates are then verified with the exact DP distance
(`F.levenshtein`, JVM-side), making the join recall- AND
precision-exact; the neighborhood is purely a candidate pruner.

Scale posture: the variant explode is a narrow per-row map (no
shuffle); the self-join shuffles on the variant hash; hot variants
are bounded by the vocabulary of short strings sharing a deletion,
and the candidate set is deduplicated per pair BEFORE the O(L²)
verify. Nothing is quadratic in the corpus — only in each variant
bucket, the same discipline as the LSH band joins in dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del1(s: str, idx: str) -> str:
    """SQL for the array of strings got by deleting each single
    character of ``s`` (an expression string), using ``idx`` as the
    lambda variable name (nested lambdas need distinct names)."""
    return (
        f"transform(sequence(1, length({s})), "
        f"{idx} -> concat(substring({s}, 1, {idx} - 1), "
        f"substring({s}, {idx} + 1, length({s}))))"
    )


def deletion_variants(col: F.Column, depth: int = 2) -> F.Column:
    """All distinct strings reachable from the column by deleting up
    to ``depth`` characters (including the string itself), computed
    array-side with JVM expressions — no Python boundary. The input
    column must be named ``s`` in the enclosing plan."""
    if depth < 1 or depth > 2:
        raise ValueError("deletion depth must be 1 or 2")
    expr = f"array_union(array(s), {_del1('s', 'i')})"
    if depth == 2:
        d2 = f"flatten(transform({_del1('s', 'i')}, t -> {_del1('t', 'j')}))"
        expr = f"array_union({expr}, array_distinct({d2}))"
    return F.expr(expr)


def fuzzy_self_join(
    names: DataFrame,
    name_col: str = "name",
    max_dist: int = 2,
) -> DataFrame:
    """All unordered pairs of distinct ``name_col`` values within
    Levenshtein distance ``max_dist`` (1 or 2), as
    (name_a, name_b, dist) with name_a < name_b.

    ``names`` should already be distinct on ``name_col`` (the helper
    re-distincts defensively — idempotent if it was).
    """
    base = names.select(F.col(name_col).alias("s")).distinct()
    vars_df = base.select(
        "s", F.explode(deletion_variants(F.col("s"), max_dist)).alias("v")
    ).distinct()
    a = vars_df.alias("a")
    b = vars_df.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("name_a"), F.col("b.s").alias("name_b"))
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )
