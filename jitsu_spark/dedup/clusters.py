"""Near-duplicate clustering: candidate pairs -> connected components ->
one keeper per component. Closes the dedup loop (shingle -> minhash ->
LSH candidates -> Jaccard verify -> CLUSTER -> keep/drop): pairwise
verification alone cannot dedup, because near-dup relations are not
transitive pair-by-pair — A~B and B~C must collapse into one group even
when A~C was never a candidate pair.

``connected_components`` is iterative min-label propagation expressed in
DataFrame joins: every node starts labeled with itself; each round every
node takes the min of its own label and its neighbors' labels; fixpoint
= components. Rounds are bounded by the component diameter — near-dup
clusters are small and dense (diameter ~2-3), so a handful of rounds
closes real corpora; ``max_iter`` guards pathological chains. Each round
is one shuffle join on the (tiny) edge set — the documents themselves
never enter the loop.

At 100 TB the edge set after LSH+verify is a vanishing fraction of the
corpus (that is the point of LSH), so the loop's cost is negligible next
to the candidate generation; for adversarial billion-edge graphs swap in
the alternating large-star/small-star variant behind the same signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component
    = the minimum node id reachable through the pair graph."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "v2"),
                edges["v"] == F.col("v2"),
            )
            .groupBy("u")
            .agg(F.min("component").alias("_nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels["node"] == neighbor_min["u"], "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: component := component-of-component. The label
        # graph is a forest pointing at smaller ids, so jumping halves
        # path lengths each round — convergence in O(log diameter) rounds
        # instead of O(diameter) (a plain neighbor-min loop silently
        # under-merges long chains within any fixed max_iter).
        parents = stepped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        updated = (
            stepped.join(
                parents, stepped["component"] == parents["p_node"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_comp"), F.col("component")),
                ).alias("component"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # truncate the lineage
        # fixpoint when no node's label can improve any further
        n_changed = (
            updated.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = updated
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pathological graph diameter); raise max_iter"
        )
    return labels


def near_dup_components(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float = 0.6,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_iter: int = 15,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify ->
    connected components. Returns (<id_col>, component, is_keeper) for
    every document that belongs to a near-dup group (keeper = min id)."""
    from jitsu_spark.dedup.minhash import ngram_jaccard_pairs

    verified = ngram_jaccard_pairs(
        docs, id_col, text_col, shingle_n=shingle_n,
        min_jaccard=min_jaccard, k=k, bands=bands,
    ).select("id_a", "id_b")
    comp = connected_components(verified, max_iter=max_iter)
    return comp.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
