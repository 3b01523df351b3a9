"""Connected components over candidate-duplicate pairs.

Dedup pipelines need transitive closure: LSH emits PAIRS (a~b, b~c), but the
keep/drop decision needs CLUSTERS ({a,b,c} -> keep min id).  This is the one
genuinely iterative algorithm in the pipeline — each iteration is a pure
distributed join+aggregate; only the (scalar) convergence check touches the
driver.

Algorithm: min-label propagation.  Every node starts labeled with itself;
each round a node takes the min label among itself and its neighbors;
converged when no label changes.  Rounds needed = graph diameter — duplicate
clusters are near-cliques (diameter 2-3), so this converges in a handful of
rounds at any corpus size.  For adversarial long-chain graphs, switch to the
large-star/small-star variant (same join primitives, O(log n) rounds).

Scale shape per round: one shuffle join (labels x edges, both partitioned on
the join key) + one groupBy-min with partial aggregation.  Labels are
localCheckpoint()ed per round: persistence alone is NOT enough for iterative
DataFrames — each round references the previous labels twice (neighbor join
+ convergence check), so the LOGICAL plan doubles per round and analysis
itself goes exponential (OOMs near round 10 on a 10-node chain).  Eager
localCheckpoint truncates lineage to a leaf, keeping every round's plan
constant-size.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(component, node) for every node appearing in ``edges``.

    ``component`` is the minimum node id of the node's connected component —
    the canonical "keeper" under min-id dedup policy.

    Deep-iteration state handling: the first rounds checkpoint labels with
    ``localCheckpoint`` (cheapest truncation; duplicate clusters converge in
    diameter 2-3 rounds and never go deeper), but past round 8 the label
    table is MATERIALIZED TO PARQUET and re-read instead.  Measured on this
    Spark build: per-round cost under repeated localCheckpoint stays flat
    for ~16 rounds and then DOUBLES EVERY ROUND (0.7 s -> 120 s by round
    22 on an 8k-node chain) even though both the optimized plan and the
    RDD debug lineage stay constant-size — checkpoint-frame metadata
    accumulates across self-referencing rounds and the planner re-walks
    it.  A parquet round-trip is a guaranteed-clean leaf with fresh
    attributes (measured flat at ~0.7 s/round through 26+ rounds) and is
    the classic iterative-job state materialization — on a cluster the
    same writes land on the shared FS, sized to the label table (8-16 B
    per node), not the corpus."""
    import tempfile
    # symmetrize once and PERSIST: the edge relation is joined every round —
    # without this each iteration re-executes the whole upstream pipeline
    # (e.g. the LSH candidate generation) that produced the pairs
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.union(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    nodes = sym.select(F.col("u").alias("node")).distinct()
    # eager localCheckpoint: materializes AND truncates lineage to a leaf
    labels = nodes.select("node", F.col("node").alias("comp")).localCheckpoint()

    state_dir: str | None = None
    for _round in range(max_iter):
        # neighbor labels: for each node, the min comp among its neighbors
        nbr = (
            sym.join(labels, sym.v == labels.node)
            .select(sym.u.alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("comp"),
        )
        # path compression (shortcutting): comp'[u] = comp[comp[u]].  The
        # min-label invariant comp[x] <= x makes the lookup only ever
        # shrink a label, and composing it with the neighbor step squares
        # the propagation distance per round — chains (mutual-kNN graphs,
        # long URL redirect trails) converge in O(log diameter) rounds
        # instead of diameter rounds, while near-clique dup clusters are
        # unaffected.  One extra self-join per round, labels-table-sized.
        parent = stepped.select(
            F.col("node").alias("comp"), F.col("comp").alias("_pcomp")
        )
        compressed = stepped.join(parent, "comp", "left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce("_pcomp", F.col("comp"))
            ).alias("comp"),
        )
        if _round < 8:
            new_labels = compressed.localCheckpoint()
        else:
            # deep-iteration regime: parquet-materialized state (see the
            # docstring's measured localCheckpoint degradation)
            if state_dir is None:
                state_dir = tempfile.mkdtemp(prefix="kwack_cc_state_")
            path = f"{state_dir}/round{_round}"
            compressed.write.mode("overwrite").parquet(path)
            new_labels = edges.sparkSession.read.parquet(path)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels.select(F.col("comp").alias("component"), "node")


def dedup_clusters(
    pairs: DataFrame,
    id_col: str = "id_a",
    other_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster-level dedup decisions from a pair list: every clustered doc
    mapped to its keeper (the component's min id) with the cluster size."""
    cc = connected_components(pairs, id_col, other_col, max_iter)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("keep_id"),
            "cluster_size",
        )
    )
