"""Graph operators: fixed-iteration PageRank over an edge DataFrame.

Second iterative algorithm in the engine next to
`dedup.connected_components` — together they pin the pattern any
iterative workload needs on Spark: keyed joins per round, lineage
truncation via checkpointing, and NO driver-side graph state (Tez users
run exactly this class of job as multi-round DAGs; Pregel-on-Tez /
Giraph is the reference-era equivalent — SURVEY §4.5 delegates the
scheduling to Spark, the algorithm lives here).

Scale shape per iteration:
- out-degrees are joined onto the edge list ONCE before the loop (the
  degree of an edge's source never changes), so each round is a single
  equi-join `edges join ranks` on the source node — co-partitioned
  across rounds, so AQE reuses the exchange;
- contributions aggregate with map-side partial sums (shuffle carries
  one row per (dst) per map partition, not one per edge);
- `localCheckpoint` every round truncates the exponentially growing
  plan (on a real cluster use `checkpoint(reliable)` — executor loss
  under localCheckpoint forces a full recompute; same note as
  connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank with `iters` synchronous iterations over a directed edge
    list (duplicate edges count once — dedup upstream if needed).

    rank_0(v) = 1/N;
    rank_{i+1}(v) = (1-d)/N + d * sum over in-neighbors u of
                    rank_i(u) / outdeg(u).

    Nodes = src ∪ dst. Nodes with no out-edges leak their damped mass
    (the simple-leak variant — deterministic and cheap; feed a
    symmetrized edge list if you need a leak-free chain). Output:
    (node, rank) with rank rounded to 6 dp, ordered by node.

    The scalar N rides as a 1-row cross join — never collected; the
    per-round plan is two joins + one partial-aggregated groupBy, and
    `localCheckpoint` keeps round i's plan independent of round i-1.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_df = nodes.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    outdeg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__od"))
    # degrees never change across rounds: pre-join them onto the edges once
    # (keeping __od as a column, so each round still computes rank/__od —
    # bit-identical arithmetic to joining outdeg per round)
    ew = e.join(outdeg, "__src").localCheckpoint()

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            ew.join(ranks, ew["__src"] == ranks["node"])
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") / F.col("__od")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy("node")
