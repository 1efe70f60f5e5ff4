"""Connected components over an edge list — duplicate-cluster resolution
for dedup pipelines (beyond-reference surface).

Near-dup detectors (MinHash/SimHash/embedding-cosine) emit PAIRS; a real
dedup pass needs CLUSTERS (keep one doc per connected component of the
similarity graph).  This is iterative min-label propagation:

    comp(v)  <-  min(comp(v), min over neighbors u of comp(u))

repeated until a fixpoint.  Each iteration is one join + one groupBy —
both plain hash-shuffles on the node id that Catalyst/AQE handle like any
aggregation.  Convergence takes O(graph diameter) rounds; dedup similarity
graphs are overwhelmingly tiny star/clique clusters, so diameter (and the
round count) is small in practice.  At extreme scale the same skeleton
upgrades to the Kiveris et al. large-star/small-star variant (alternating
edge rewrites that converge in O(log n) rounds); the per-round dataflow —
join, min-aggregate, convergence check — is identical.

Lineage control: every round materializes via ``localCheckpoint`` so the
plan does not grow by one join per iteration (Catalyst re-optimizing an
N-round lineage is quadratic; checkpointing keeps each round O(1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node id
    reachable through undirected edges.  Deterministic (pure min-fixpoint,
    no randomness, independent of partition layout).
    """
    sym = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select("id").distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iterations):
        nbr_comp = labels.select(
            F.col("id").alias("nbr"), F.col("comp").alias("nbr_comp")
        )
        msgs = sym.join(nbr_comp, "nbr").select(
            "id", F.col("nbr_comp").alias("comp")
        )
        new_labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # Min-label propagation advances one hop per round; a chain longer
        # than max_iterations would otherwise return silently WRONG labels
        # (nodes not yet reached by their component's min id).  The `changed`
        # probe above already detects the fixpoint, so non-convergence here
        # is definitive, not a heuristic.
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the round budget); raise "
            "max_iterations or switch to a large-star/small-star variant"
        )
    return labels
