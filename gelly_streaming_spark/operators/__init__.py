from gelly_streaming_spark.operators.graphstream import GraphStream
from gelly_streaming_spark.operators.windows import GraphWindowStream
from gelly_streaming_spark.operators.aggregation import SummaryAggregation
from gelly_streaming_spark.operators.joins import asof_join, top_k

__all__ = ["GraphStream", "GraphWindowStream", "SummaryAggregation", "asof_join", "top_k"]
