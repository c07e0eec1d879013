"""HITS hubs & authorities — extension algorithm (Kleinberg 1999).

The reference library ships no link-analysis operators (SURVEY §2.9);
this complements PageRank with the query-dependent hub/authority
decomposition — the other classical web-curation signal (a page that
LINKS TO many authorities is a hub; a page linked FROM many hubs is an
authority).

Semantics (the certified q73 contract): directed DISTINCT edges,
self-loops dropped; ``iters`` synchronous mutual-reinforcement rounds
from ``hub_0 = 1``:

    auth_t(v) = Σ_{(u,v) ∈ E} hub_{t-1}(u)
    hub_t(u)  = Σ_{(u,v) ∈ E} auth_t(v)

UNNORMALIZED — Kleinberg's per-round L2 normalization only rescales
(the ranking is identical), and dropping it makes every score an exact
INTEGER for unit init: the cross-engine hash needs no float margins at
all (the q57/q60 exactness class, where q56/q68 needed measured
margins and double-rounding). Production callers that want bounded
magnitudes normalize the returned columns once. Scores grow like
(singular value)^{2t}, so fixed small ``iters`` is also the numeric
contract — 64-bit sums overflow around iters ≈ 6 on dense graphs; the
certified contract is 2.

100 TB shape: per round two keyed shuffles (a src-keyed join of edges
against the |V|-row hub table + dst-keyed partial-agg sum; then the
mirror for hubs) over |V|/|E|-bounded data — the q56 loop shape without
the teleport column; the final frame is checkpointed so the returned
plan is self-contained (2 rounds stay shallow, so no mid-loop cuts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gelly_streaming_spark.operators.graphstream import GraphStream
from gelly_streaming_spark.plans.memory import free_checkpoint


def hits(stream: GraphStream, iters: int = 2) -> DataFrame:
    """Rows (id, hub, auth): unnormalized HITS scores after ``iters``
    synchronous rounds (exact integers — see module docstring)."""
    if iters < 1:
        raise ValueError(f"hits: iters must be >= 1, got {iters}")
    from pyspark.sql import Observation

    obs_e = Observation()
    e = (
        stream.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("m"))
        .localCheckpoint()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    # loop shuffle width right-sized to the measured edge count (the
    # sibling-loop convention); conf restored in finally
    sess_conf = stream.edges.sparkSession.conf
    old_parts = sess_conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(1, min(int(old_parts), int(obs_e.get["m"]) // 500_000 + 1))
    hub = verts.withColumn("h", F.lit(1).cast("long"))
    auth = None
    try:
        sess_conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        for _ in range(iters):
            a_sums = (
                e.join(hub, e["src"] == hub["id"])
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("h").alias("a"))
            )
            auth = verts.join(a_sums, "id", "left").select(
                "id", F.coalesce("a", F.lit(0).cast("long")).alias("a")
            )
            h_sums = (
                e.join(auth, e["dst"] == auth["id"])
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("a").alias("h"))
            )
            hub = verts.join(h_sums, "id", "left").select(
                "id", F.coalesce("h", F.lit(0).cast("long")).alias("h")
            )
        out = (
            hub.join(auth, "id")
            .select("id", F.col("h").alias("hub"), F.col("a").alias("auth"))
            .localCheckpoint()
        )
    finally:
        sess_conf.set("spark.sql.shuffle.partitions", old_parts)
        free_checkpoint(e)
        # inside finally (ADVICE r14): an exception mid-loop otherwise
        # leaks the |V|-row verts checkpoint until GC
        free_checkpoint(verts)
    return out
