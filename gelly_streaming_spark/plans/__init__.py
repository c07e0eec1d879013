from gelly_streaming_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_wholestage_codegen,
    explain_str,
)
from gelly_streaming_spark.plans.memory import free_checkpoint

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_wholestage_codegen",
    "explain_str",
    "free_checkpoint",
]
