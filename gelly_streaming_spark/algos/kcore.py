"""k-core peeling — extension algorithm (graph curation primitive).

The reference library is CC / bipartiteness / spanner plus triangle
examples (SURVEY §2.9); it ships no coreness computation. The k-core —
the maximal subgraph where every vertex keeps degree ≥ k — is the
standard graph-side curation filter (link-spam farms and orphan pages
peel away; the web-graph analog of the text-side quality filters), and
the peeling loop is the same Pregel-style driver shape as the sibling
algorithms (SURVEY §7.4.H2).

Semantics (the certified q72 contract): undirected DISTINCT edges with
self-loops dropped; ``rounds`` synchronous peel steps, each removing
every vertex whose CURRENT degree is < k (and the edges touching it),
all removals within a step simultaneous; output is each surviving
vertex's degree in the subgraph after the final step. Fixed ``rounds``
with an early exit the step nothing peels (idempotent from then on, so
the exit cannot diverge from the fixed-round oracle — the LPA/PageRank
convention). Full convergence to the true k-core is ``converged=True``
(property-tested; bounded by |V| steps in theory, a handful in
practice).

100 TB shape: per step, ONE (vertex)-keyed partial-agg degree count
(map-side combine), then two semi-joins restricting the edge list to
surviving endpoints — sort-merge joins AQE can split on skew; the edge
list checkpoints per step (plan depth O(1), superseded blocks freed),
and the step's surviving-edge count rides the checkpoint job's
Observation so the early exit costs zero extra jobs. All arithmetic is
integer — no float margins exist for the cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gelly_streaming_spark.operators.graphstream import GraphStream
from gelly_streaming_spark.plans.memory import free_checkpoint


def k_core(
    stream: GraphStream,
    k: int = 2,
    rounds: int = 3,
    converged: bool = False,
) -> DataFrame:
    """Rows (id, degree): surviving vertices and their degrees after
    ``rounds`` synchronous k-core peel steps (``converged=True`` peels
    to the true k-core fixpoint instead)."""
    if k < 1:
        raise ValueError(f"k_core: k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"k_core: rounds must be >= 1, got {rounds}")
    from pyspark.sql import Observation

    e = (
        stream.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    obs0 = Observation()
    eu = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # distinct AFTER symmetrizing (the label_propagation convention):
        # an input holding both (a,b) and (b,a) otherwise contributes the
        # pair twice in each direction and double-counts both endpoints'
        # degrees against the documented undirected-DISTINCT contract
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("m"))
        .localCheckpoint()
    )
    m_prev = int(obs0.get["m"])
    prev_ckpt = eu
    # loop shuffle width right-sized to the measured edge count (the
    # LPA/PageRank convention — 32-way exchanges on a 10k-edge snapshot
    # are pure task overhead); conf restored in finally
    sess_conf = stream.edges.sparkSession.conf
    old_parts = sess_conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(1, min(int(old_parts), m_prev // 500_000 + 1))
    step = 0
    try:
        sess_conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        while m_prev > 0:
            step += 1
            deg = eu.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
            keep = deg.where(F.col("degree") >= k).select("src")
            obs = Observation()
            nxt = (
                eu.join(keep, "src", "left_semi")
                .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
                .observe(obs, F.count(F.lit(1)).alias("m"))
                .localCheckpoint()
            )
            m = int(obs.get["m"])
            free_checkpoint(prev_ckpt)
            prev_ckpt = nxt
            eu = nxt
            if m == m_prev or m == 0:
                break  # fixpoint (or empty) — remaining steps are no-ops
            m_prev = m
            if not converged and step >= rounds:
                break
    finally:
        sess_conf.set("spark.sql.shuffle.partitions", old_parts)
    return eu.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
