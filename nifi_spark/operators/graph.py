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
    algo: str = "minlabel",
    return_rounds: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id in the node's component.

    Nodes absent from ``edges`` are their own components — callers union
    them back (see the ``dedup_clusters`` query).

    ``algo``:

    - ``"minlabel"`` (default) — per-round neighbor-min propagation;
      rounds = cluster diameter. Right for near-dup graphs, which are
      near-cliques (diameter ≲ 3), at one keyed shuffle per round.
    - ``"star"`` — alternating large-star/small-star (the MapReduce CC
      family, Kiveris et al.); converges in O(log n) rounds on ANY shape,
      including the pathological chains where min-label needs O(n)
      rounds. Two keyed shuffles per round — pick it when cluster
      diameters are unknown or large.

    ``return_rounds=True`` returns ``(labels, rounds_used)`` instead of
    just the labels frame (for convergence diagnostics/tests).
    """
    if algo not in ("minlabel", "star"):
        raise ValueError(f"algo must be 'minlabel' or 'star', got {algo!r}")
    if algo == "star":
        return _cc_star(edges, src, dst, max_iter, return_rounds)
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for r in range(max_iter):
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
    out = labels.select("node", F.col("label").alias("component"))
    return (out, r + 1) if return_rounds else out


def _cc_star(
    edges: DataFrame, src: str, dst: str, max_iter: int, return_rounds: bool
):
    """Alternating large-star/small-star rounds to a fixpoint.

    One round:

    - **large-star** — every node u connects its LARGER neighbors to
      ``m = min(Γ(u) ∪ {u})``: tall chains collapse toward small ids in
      parallel (this is the doubling step that yields O(log n) rounds);
    - **small-star** — over larger→smaller directed edges, u and its
      smaller neighbors all connect to their minimum: flattens partial
      trees into stars.

    Each half is a groupBy-min + join on the node id — two keyed
    shuffles per round, no collect of edges. Fixpoint when the edge set
    stops changing (count + order-insensitive hash checksum, riding one
    tiny agg on the already-checkpointed frame). At the fixpoint the
    edges ARE the (node → component-min) star map.
    """
    spark = edges.sparkSession

    def _fresh(df: DataFrame) -> DataFrame:
        """Materialize + cut lineage, then re-wrap as a brand-new
        LogicalRDD. The re-wrap matters: a localCheckpoint'd frame keeps
        the originating plan's constraints/stats, and checkpointing a
        plan BUILT ON such a frame again (every round here) trips
        Catalyst's attribute remap (`key not found: a#N`) on complex
        upstream lineage. createDataFrame(rdd, schema) carries data
        partitions only — each round starts from a clean slate."""
        ck = df.localCheckpoint(eager=True)
        return spark.createDataFrame(ck.rdd, df.schema)

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    cur = _fresh(
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    )
    prev_sig = None
    rounds = 0
    for rounds in range(1, max_iter + 1):
        # large-star needs full neighborhoods: re-symmetrize (small-star
        # leaves larger→smaller directed edges)
        nbrs = cur.union(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
        # large-star: m = min over Γ(u) ∪ {u}; emit (v, m) for v > u.
        # The min side renames its key — both sides descend from `cur`, and
        # a same-name self-join leaves Catalyst unable to resolve which
        # `a` the downstream projection means.
        mins = nbrs.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        ).select(F.col("a").alias("_ma"), "m")
        large = (
            nbrs.join(mins, F.col("a") == F.col("_ma"))
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # small-star over larger→smaller edges: u and all its smaller
        # neighbors attach to the minimum among them
        directed = large.filter(F.col("b") < F.col("a"))
        smins = directed.groupBy("a").agg(F.min("b").alias("m")).select(
            F.col("a").alias("_sa"), "m"
        )
        joined = directed.join(smins, F.col("a") == F.col("_sa"))
        small = _fresh(
            joined.select(F.col("a"), F.col("m").alias("b"))
            .union(
                joined.filter(F.col("b") != F.col("m")).select(
                    F.col("b").alias("a"), F.col("m").alias("b")
                )
            )
            .distinct()
        )
        sig = small.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-insensitive and overflow-free (a sum of full
            # 64-bit hashes overflows under ANSI arithmetic)
            F.bit_xor(F.xxhash64("a", "b")).alias("h"),
        ).collect()[0]
        cur = small
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # fixpoint edges are (node > root) → root stars; roots label themselves
    comp = cur.groupBy("a").agg(F.min("b").alias("component")).select(
        F.col("a").alias("node"), "component"
    )
    roots = (
        cur.select(F.col("b").alias("node"))
        .distinct()
        .join(comp.select("node"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    out = comp.unionByName(roots)
    return (out, rounds) if return_rounds else out
