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
to the candidate generation; for adversarial high-diameter/billion-edge
graphs ``algorithm="star"`` swaps in the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") behind the same signature — O(log² n) rounds
with per-round work proportional to the edge set, no per-node state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
    algorithm: str = "jump",
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component
    = the minimum node id reachable through the pair graph.

    ``algorithm="jump"`` (default) is min-label propagation with pointer
    jumping — fastest on the small dense clusters real near-dup corpora
    produce. ``algorithm="star"`` is alternating large-star/small-star —
    use for adversarial graphs (very long chains / huge components) where
    label propagation needs too many rounds."""
    if algorithm == "star":
        return _cc_star(pairs, id_a, id_b, max_iter=max(max_iter, 30))
    if algorithm != "jump":
        raise ValueError(f"unknown algorithm {algorithm!r}")
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


def _cc_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Each round rewrites the EDGE set (never per-node label state):
    large-star hangs every larger neighbor of u onto min(Γ⁺(u));
    small-star (on big→small oriented edges) hangs u and all its smaller
    neighbors onto that minimum. The edge set converges to disjoint stars
    (node → component-min) in O(log² n) rounds regardless of diameter —
    the chain graph that starves label propagation collapses
    exponentially here. Re-derived from the published algorithm
    (Kiveris et al. 2014); min/greatest work on string ids too."""
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    all_nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # canonical big→small orientation
    edges = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    converged = False
    for _ in range(max_iter):
        # large-star over the symmetric neighborhood
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
        mins = mins.select("u", F.least("u", "_mv").alias("_m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: edges in `large` are already big→small
        mins2 = large.groupBy("u").agg(F.min("v").alias("_mv"))
        lj = large.join(mins2, "u")
        small = (
            lj.select(F.col("v").alias("n"), F.col("_mv").alias("m"))
            .union(lj.select(F.col("u").alias("n"), F.col("_mv").alias("m")))
            .filter(F.col("n") != F.col("m"))
            .distinct()
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
        )
        small = small.localCheckpoint(eager=True)  # truncate lineage
        stable = (
            small.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(small).limit(1).count() == 0
        )
        edges = small
        if stable:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"star connected_components did not converge in {max_iter} rounds"
        )
    # fixpoint edges are stars: u → component root; roots label themselves
    return all_nodes.join(
        edges.withColumnRenamed("u", "node"), on="node", how="left"
    ).select("node", F.coalesce("v", "node").alias("component"))


def near_dup_components(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float = 0.6,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_iter: int = 15,
    algorithm: str = "jump",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify ->
    connected components. Returns (<id_col>, component, is_keeper) for
    every document that belongs to a near-dup group (keeper = min id)."""
    from jitsu_spark.dedup.minhash import ngram_jaccard_pairs

    verified = ngram_jaccard_pairs(
        docs, id_col, text_col, shingle_n=shingle_n,
        min_jaccard=min_jaccard, k=k, bands=bands,
    ).select("id_a", "id_b")
    comp = connected_components(verified, max_iter=max_iter, algorithm=algorithm)
    return comp.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
