"""Connected components over near-dup pair graphs → dedup clusters.

Pair generators (MinHash-LSH, SimHash, embedding near-dup) emit
(id_a, id_b) edges; the thing a training-data pipeline actually needs
is the CLUSTER: one canonical id per document so every near-duplicate
family keeps exactly one representative. This is iterative min-label
propagation — each round every node adopts the smallest label in its
neighborhood, converging in O(graph diameter) rounds (dedup families
are shallow: near-dup clusters are cliques or short chains, so 3–5
rounds in practice).

Scale shape: each round is one shuffle join on node id plus one
map-side-combined min-aggregate; each round's labels are
`localCheckpoint`ed so the LINEAGE is truncated — labels feed the next
round twice (join + neighbor-min), so without truncation the logical
plan doubles per round and the driver OOMs building plan strings long
before the data is big. Convergence is a changed-label count (map-side
combine). No driver materialization of nodes or edges. (On a real
cluster prefer reliable `checkpoint()` to a checkpoint dir for
fault-tolerance; localCheckpoint trades that for speed.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(node long, label long): label = smallest node id reachable
    from `node` over the undirected pair graph — the canonical
    cluster representative. Only nodes appearing in `pairs` are
    returned (isolated docs are their own cluster by definition)."""
    edges = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the convergence flag is computable INSIDE the round (a label
        # changes iff some neighbor label is strictly smaller), so the
        # old separate new-vs-old join — one more shuffle per round —
        # is unnecessary; the count below reads the checkpointed round
        new_full = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label"))
                    < F.col("label")
                ).alias("__changed"),
            )
            .localCheckpoint()
        )
        changed = new_full.filter(F.col("__changed")).count()
        # the previous round's checkpoint blocks are dead once the new
        # round is materialized and compared — free them (best-effort)
        labels.unpersist()
        labels = new_full.drop("__changed")
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components stopped at max_iters={max_iters} before "
            "convergence — a component with a larger diameter keeps "
            "multiple labels; raise max_iters",
            stacklevel=2,
        )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(node, label, keep): cluster assignment plus the keep flag —
    `keep` is true only for the cluster representative (min id), i.e.
    the row a dedup pipeline retains."""
    labels = connected_components(pairs, id_a, id_b, max_iters)
    return labels.withColumn("keep", F.col("node") == F.col("label"))
