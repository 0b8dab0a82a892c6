"""Connected components — duplicate-cluster canonicalization at scale.

Near-duplicate detection (operators/dedup_fuzzy: MinHash-LSH, SimHash)
emits PAIRS; a production dedup pipeline needs the transitive closure —
every document mapped to ONE canonical representative per duplicate
cluster, or a chain a~b, b~c silently keeps two copies. The reference has
no graph operator (DetectDuplicate / DeduplicateRecord,
.../standard/DeduplicateRecord.java, are key-equality only), so this is
an engine extension in the spirit of the web-scale dedup literature
(the MapReduce connected-components family, e.g. large-star/small-star).

Implementation: iterative min-label propagation over the symmetrized edge
list — ``label(v) ← min(label(v), min label over neighbors)`` to a
fixpoint. Each round is ONE keyed shuffle (join + groupBy on node);
``localCheckpoint`` cuts the plan per round so lineage stays O(1); the
convergence probe rides the checkpoint materialization. Rounds needed =
cluster diameter — near-dup clusters are near-cliques (diameter ≲ 3), so
a handful of rounds in practice; ``max_iter`` bounds pathological chains
(for those, the O(log n) star algorithms are the upgrade path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id in the node's component.

    Nodes absent from ``edges`` are their own components — callers union
    them back (see the ``dedup_clusters`` query).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(sym["b"].alias("node2"))
            .agg(F.min("label").alias("nl"))
        )
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias(
                    "new_label"
                ),
                (F.coalesce(F.col("nl"), F.col("label")) < F.col("label"))
                .cast("long")
                .alias("_chg"),
            )
            .localCheckpoint(eager=True)  # cut lineage; materialize once
        )
        changed = stepped.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
