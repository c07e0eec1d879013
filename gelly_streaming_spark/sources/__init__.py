from gelly_streaming_spark.sources.tables import load_table, TABLES
from gelly_streaming_spark.sources.edges import (
    edges_cust_order,
    edges_order_part,
    edges_copart,
    edges_events,
)
from gelly_streaming_spark.sources.fixtures import fixture_graph, FIXTURE_GRAPHS

__all__ = [
    "load_table",
    "TABLES",
    "edges_cust_order",
    "edges_order_part",
    "edges_copart",
    "edges_events",
    "fixture_graph",
    "FIXTURE_GRAPHS",
]
