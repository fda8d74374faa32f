"""Connected-components clustering for near-duplicate groups.

Pair-producing dedup operators (``operators.dedup``) emit edges
(doc_a, doc_b); a curation pipeline needs *clusters* — one canonical id
per transitively-connected duplicate group — so it can keep exactly one
survivor per group (pairs alone under-delete: a~b and b~c does not drop
c unless the transitive closure is computed).

The algorithm is distributed hash-min label propagation:

- every node starts labelled with itself;
- each round, every node takes the min of its own label and its
  neighbors' labels (one equi-join edges⋈labels + one groupBy-min);
- converged when no label changed; the fixpoint label is the minimum
  node id reachable in the component, i.e. a canonical cluster id.

Scale posture (100 TB / billions of edges):

- each round is ONE shuffle join on node id + ONE aggregation — no
  driver-side graph structure, no collect; the labels frame is
  O(nodes-in-any-pair), far smaller than the corpus;
- rounds = O(component diameter); near-dup components are shallow
  (star-ish around a template), so a handful of rounds in practice.
  For adversarially long chains the alternating large-star/small-star
  variant (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SOCC'14) bounds rounds at O(log² n); the propagation step
  here is the building block it shares;
- ``localCheckpoint`` truncates the per-round lineage so the plan does
  not grow with iterations (on a real cluster, a reliable checkpoint
  dir does the same job fault-tolerantly);
- convergence is detected from the materialized round result with a
  single count aggregation — no extra pass over the edges.

The reference engine has no graph operator (its dedup surface stops at
the table substrate); this is a beyond-parity training-pipeline
operator, oracle-checked against a DuckDB recursive CTE computing the
same min-reachable-id labels (p18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when label propagation fails to converge in the round cap."""


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    out_id: str = "doc_id",
    out_cluster: str = "cluster_id",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node in ``pairs`` with its component's minimum id.

    ``pairs`` is an undirected edge list (one row per pair, either
    orientation). Returns one row per distinct node: (out_id,
    out_cluster) where out_cluster = min node id transitively reachable.
    """
    # Symmetric expansion via explode, NOT union-of-two-selects: a union
    # would place the (possibly expensive) pair-producing subplan in the
    # DAG twice and Spark executes both arms — explode emits both
    # orientations from a single pass over one execution of ``pairs``.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Deduplicate once up front: repeated pairs only re-propagate the
    # same label and inflate every round's join.
    edges = edges.distinct().persist()

    # Round 1 fused into initialization (r12, guide §2.4): from identity
    # labels, round 1 computes min(node, min of neighbor ids) — which is
    # ONE aggregation straight off the symmetric edge list (every node
    # appears as dst of each of its neighbors). This replaces the former
    # identity-labels distinct + checkpoint + a full join-union-agg round:
    # one exchange and one materialization instead of three.
    labels = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.min("src").alias("mn"))
        .select("node", F.least(F.col("node"), F.col("mn")).alias("lbl"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_rounds - 1):
        # Propagate: each node offers its label to every neighbor.
        offers = edges.join(labels, edges["src"] == labels["node"]).select(
            F.col("dst").alias("node"), F.col("lbl")
        )
        # Keep the old label alongside the new minimum so convergence is
        # read off the SAME materialized result (no second join pass).
        merged = (
            labels.withColumn("own", F.lit(True))
            .unionByName(offers.withColumn("own", F.lit(False)))
            .groupBy("node")
            .agg(
                F.min("lbl").alias("new_lbl"),
                F.min(F.when(F.col("own"), F.col("lbl"))).alias("old_lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.filter(F.col("new_lbl") != F.col("old_lbl")).limit(1).count()
        )
        labels = merged.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            edges.unpersist()
            return labels.select(
                F.col("node").alias(out_id), F.col("lbl").alias(out_cluster)
            )
    edges.unpersist()
    raise ConvergenceError(
        f"label propagation did not converge in {max_rounds} rounds"
    )


def neardup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Cluster near-duplicate pairs: (doc_id, cluster_id, cluster_size).

    cluster_id is the minimum doc id in the component (a deterministic
    canonical representative — "keep doc_id == cluster_id" is the
    survivor rule); cluster_size counts member docs. Singleton docs
    (never in a pair) are not emitted — they are trivially their own
    cluster and emitting them would make the output O(corpus).
    """
    labels = connected_components(pairs, a_col=a_col, b_col=b_col)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )
