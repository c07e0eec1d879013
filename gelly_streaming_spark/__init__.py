"""gelly_streaming_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference streaming-graph library
(vasia/gelly-streaming, a Flink DataStream graph-streaming API).

Not a port: the reference's dataflow operators are re-expressed as
DataFrame / Spark SQL plans so Catalyst + Tungsten pick the physical
strategy. See SURVEY.md for the operator-by-operator mapping.

Public surface:
  GraphStream          edge-stream handle (reference: GraphStream/SimpleEdgeStream)
  GraphWindowStream    windowed graph discretization (reference: GraphWindowStream)
  SummaryAggregation   partial-fold + global-merge pattern (reference: SummaryAggregation)
"""

from gelly_streaming_spark.session import get_spark, prepare_session
from gelly_streaming_spark.operators.graphstream import GraphStream
from gelly_streaming_spark.operators.windows import GraphWindowStream
from gelly_streaming_spark.operators.aggregation import SummaryAggregation

__all__ = [
    "get_spark",
    "prepare_session",
    "GraphStream",
    "GraphWindowStream",
    "SummaryAggregation",
]

__version__ = "0.1.0"
