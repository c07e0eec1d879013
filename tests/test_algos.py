"""Algorithm tests: golden results on fixtures G1–G4, property tests P1
(spanner stretch) and P2 (triangle-estimate tolerance) on G5/copart."""

import collections

import pyspark.sql.functions as F
import pytest

from gelly_streaming_spark import GraphStream
from gelly_streaming_spark.algos.bipartiteness import bipartiteness_check
from gelly_streaming_spark.algos.connected_components import (
    connected_components,
    connected_components_summary,
)
from gelly_streaming_spark.algos.spanner import spanner
from gelly_streaming_spark.algos.triangles import (
    triangle_count,
    triangle_count_estimate,
    triangle_count_windowed,
)
from gelly_streaming_spark.sources.edges import edges_copart
from gelly_streaming_spark.sources.fixtures import fixture_graph, g5_powerlaw


def test_cc_g4(spark):
    gs = GraphStream(fixture_graph(spark, "g4"))
    got = {r.id: r.component
           for r in connected_components(gs, small_input_rows=0).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cc_summary_matches_labelprop(spark):
    gs = GraphStream(fixture_graph(spark, "g4"))
    lp = {(r.id, r.component) for r in connected_components(gs).collect()}
    su = {(r.id, r.component) for r in connected_components_summary(gs, num_buckets=4).collect()}
    assert lp == su


def test_cc_summary_windowed(spark):
    gs = GraphStream(fixture_graph(spark, "g1"))
    out = connected_components_summary(gs, window="2 minutes", num_buckets=2).collect()
    # state persists across windows (transient_state=False): last window = full graph
    buckets = sorted({r.bucket for r in out})
    final = {r.id: r.component for r in out if r.bucket == buckets[-1]}
    assert set(final.values()) == {1}


def test_bipartiteness_scalable(spark):
    g2 = bipartiteness_check(GraphStream(fixture_graph(spark, "g2"))).collect()
    assert [r.is_bipartite for r in g2] == [True]
    g3 = bipartiteness_check(GraphStream(fixture_graph(spark, "g3"))).collect()
    assert [r.is_bipartite for r in g3] == [False]
    g1 = bipartiteness_check(GraphStream(fixture_graph(spark, "g1"))).collect()
    assert [r.is_bipartite for r in g1] == [False]  # triangles = odd cycles


def test_triangles_g1(spark):
    gs = GraphStream(fixture_graph(spark, "g1"))
    # {1,2,3}, {3,4,5}, and {1,3,5} (via edges 1-3, 3-5, 5-1)
    assert triangle_count(gs).collect()[0].n_triangles == 3


def _bfs_dist(adj, a, b, cap=64):
    if a == b:
        return 0
    seen = {a}
    frontier = [a]
    d = 0
    while frontier and d < cap:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v == b:
                    return d
                if v not in seen:
                    seen.add(v)
                    nxt.append(v)
        frontier = nxt
    return None


@pytest.mark.parametrize("k", [2, 3])
def test_spanner_stretch_property_p1(spark, k):
    g = g5_powerlaw(spark, n_vertices=500, n_edges=2000)
    gs = GraphStream(g)
    kept = [(r.src, r.dst) for r in spanner(gs, k=k, num_buckets=4).collect()]
    span_adj = collections.defaultdict(set)
    for u, v in kept:
        span_adj[u].add(v)
        span_adj[v].add(u)
    # P1: every ORIGINAL edge (u,v) must satisfy dist_spanner(u,v) <= k.
    orig = {(min(r.src, r.dst), max(r.src, r.dst)) for r in g.collect()}
    for u, v in list(orig)[:500]:
        d = _bfs_dist(span_adj, u, v, cap=k)
        assert d is not None and d <= k, f"stretch violated for edge ({u},{v})"


def test_triangle_estimate_p2(spark, sf_dir):
    gs = GraphStream(edges_copart(spark, sf_dir))
    exact = triangle_count(gs).collect()[0].n_triangles
    est = triangle_count_estimate(gs, sample_fraction=0.2, seed=42).collect()[0].est_triangles
    assert abs(est - exact) / exact < 0.30, f"estimate {est} vs exact {exact}"


def test_odd_vertex_reach_paths_agree(spark):
    """The distributed parity fixpoint and the small-input driver closure
    must produce identical (graph, is_bipartite, odd_vertices) rows."""
    import pyspark.sql.functions as F

    from gelly_streaming_spark.algos.bipartiteness import odd_vertex_reach

    tagged = None
    for g in ("g2", "g3", "g4"):
        part = fixture_graph(spark, g).select(
            F.lit(g).alias("graph"), "src", "dst"
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fast = sorted(tuple(r) for r in odd_vertex_reach(tagged).collect())
    dist = sorted(tuple(r) for r in odd_vertex_reach(tagged, small_input_rows=0).collect())
    assert fast == dist


def test_windowed_triangle_strategies_agree(spark):
    """The per-window in-task strategy and the distributed join plan must
    count identically (G1 in one window: 3 triangles)."""
    gs = GraphStream(fixture_graph(spark, "g1"))
    for strategy in ("joins", "partitioned"):
        rows = triangle_count_windowed(gs, "1 day", strategy=strategy).collect()
        assert [(r.n_triangles) for r in rows] == [3], strategy
