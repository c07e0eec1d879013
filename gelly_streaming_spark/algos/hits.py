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


def _try_small_hits(
    e_plan: DataFrame, iters: int, small_input_rows: int
) -> DataFrame | None:
    """Adaptive small-graph fast path (the CC/BFS/LPA/k-core doctrine):
    one bounded Arrow collect of the distinct directed edges, then the
    driver-local mutual-reinforcement rounds — all arithmetic is exact
    integer (Python ints cannot overflow, matching the bounded-iters
    64-bit contract on the JVM side), so the fast path is bit-safe by
    construction. Measured r15 at sf0.1: 2.9 s distributed (2 rounds of
    double join+agg+|V|-row left joins — fixed job floors dominate the
    1.2k-vertex fixture) -> ~0.45 s. Spills over the limit -> None;
    tests force the distributed loop with small_input_rows=0."""
    if small_input_rows <= 0:
        return None
    import pandas as pd

    from gelly_streaming_spark.plans.probe import bounded_take

    tbl = bounded_take(e_plan, small_input_rows, as_arrow=True)
    if tbl.num_rows > small_input_rows:
        return None
    edges = list(
        zip(tbl.column("src").to_pylist(), tbl.column("dst").to_pylist())
    )
    verts = {u for u, _ in edges} | {v for _, v in edges}
    hub = {v: 1 for v in verts}
    auth = {v: 0 for v in verts}
    for _ in range(iters):
        auth = {v: 0 for v in verts}
        for u, v in edges:
            auth[v] += hub[u]
        hub = {v: 0 for v in verts}
        for u, v in edges:
            hub[u] += auth[v]
    pdf = pd.DataFrame(
        sorted((v, hub[v], auth[v]) for v in verts),
        columns=["id", "hub", "auth"],
    )
    return e_plan.sparkSession.createDataFrame(
        pdf, "id long, hub long, auth long"
    )


def hits(
    stream: GraphStream, iters: int = 2, small_input_rows: int = 100_000
) -> DataFrame:
    """Rows (id, hub, auth): unnormalized HITS scores after ``iters``
    synchronous rounds (exact integers — see module docstring). Inputs
    whose distinct edge list fits ``small_input_rows`` run the
    driver-local fast path (bounded-collect doctrine); the distributed
    loop below is the scale path, forced in tests with
    ``small_input_rows=0``."""
    if iters < 1:
        raise ValueError(f"hits: iters must be >= 1, got {iters}")
    from pyspark.sql import Observation

    e_plan = (
        stream.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    small = _try_small_hits(e_plan, iters, small_input_rows)
    if small is not None:
        return small
    obs_e = Observation()
    e = (
        e_plan
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
