"""Label-propagation community detection over the link graph.

Complements connected components (operators/components.py): components
answer "which pages are TRANSITIVELY connected at all" (the dedup
closure), while communities answer "which densely linked neighborhood
does a page live in" — the webgraph signal behind link-farm detection,
per-community sampling quotas and domain-cluster curation (Raghavan,
Albert & Kumara 2007, the standard near-linear community algorithm).

Semantics (deterministic, synchronous variant):

- edges are symmetrized and de-self-looped; every endpoint is a node;
- round 0 labels every node with its own id;
- each round, every node simultaneously adopts the label that is MOST
  FREQUENT among its neighbors' previous-round labels, breaking count
  ties by the SMALLEST label. The node's own label gets no vote, so the
  update is a pure function of the previous round — no partition-order
  dependence, which is what makes the unrolled SQL oracle exact (the
  classic asynchronous LPA is update-order dependent and untestable).
- a FIXED number of rounds (default 4) rather than a convergence test:
  synchronous LPA can 2-cycle on bipartite structures, so fixed rounds
  are both the portable and the honest termination rule.

Scale shape per round: one equi-join labels->edges on the label side
(shuffle on v) + one two-level aggregate — groupBy(u, label) count,
then a per-node arg-max via min(struct(-cnt, label)) which partial-
aggregates map-side like any min. No window function, no driver state;
labels are localCheckpointed per round to cut the iterative lineage
(use reliable checkpoints on a real cluster). At 10^12 edges every
stage keys on uniform node ids — the same profile as the PageRank loop
(operators/pagerank.py) that holds the scaling ledger.

Reference parity: the reference engine has no graph clustering; this
extends the webgraph operator family (SURVEY.md hits/trustrank rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """(id, community) after ``rounds`` synchronous majority votes.

    ``edges`` needs (src, dst) columns; duplicate edges collapse (one
    vote per neighbor, not per anchor occurrence). Labels compare with
    the column's natural ordering (lexicographic for url ids), so the
    tie-break is deterministic for any id type."""
    if rounds < 1:
        raise ValueError("label_propagation needs rounds >= 1")
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    e = (
        fwd.unionByName(rev)
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # Adapt the loop's shuffle width to the EDGE count, not the session
    # (the connected-components move, operators/components.py:50): each
    # round is one join + two aggregates whose per-task latency
    # dominates at small widths; the count is free (e is checkpointed),
    # the width is restored in the finally, and the adaptation is a
    # no-op when the graph is big enough to need the full width.
    spark = e.sparkSession
    n_edges = e.count()
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    target = max(4, min(int(prev_sp), n_edges // 50_000 + 4))
    adapted = target < int(prev_sp)
    if adapted:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        return _lpa_loop(e, rounds)
    finally:
        if adapted:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def _lpa_loop(e: DataFrame, rounds: int) -> DataFrame:
    lab = e.select(F.col("u"), F.col("u").alias("lab")).distinct()
    for _ in range(rounds):
        votes = (
            e.join(lab.withColumnsRenamed({"u": "v", "lab": "vlab"}), "v")
            .groupBy("u", "vlab")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # arg-max by (cnt desc, label asc): min over struct(-cnt, label)
        # — partial-aggregable, unlike a row_number window.
        lab = (
            votes.groupBy("u")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("vlab").alias("l"))
                ).alias("m")
            )
            .select("u", F.col("m.l").alias("lab"))
            .localCheckpoint(eager=False)
        )
    return lab.select(F.col("u").alias("id"), F.col("lab").alias("community"))


def community_sizes(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """(community, n_members) rollup of ``label_propagation`` — the
    quota/sampling view a curation mix planner consumes."""
    return (
        label_propagation(edges, rounds)
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
