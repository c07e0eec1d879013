"""Differential test: every registry query with an oracle runs on both
Spark and DuckDB at sf0.001 and must match after canonical normalization.
This is a local pre-flight of the driver's t2 gate (which runs sf0.01).
"""

import pytest

from gelly_streaming_spark.queries import REGISTRY

from tests.util import assert_frames_match

CASES = [(name, q) for name, q in sorted(REGISTRY.items())]


@pytest.mark.parametrize("name", [n for n, q in CASES if q.sql is not None])
def test_oracle_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    assert_frames_match(q.fn(spark, sf_dir), duck.sql(q.sql), label=name)


def test_every_query_has_oracle():
    """Differential coverage is total: every registry query carries oracle
    SQL (the former rows-only weak check has an empty domain by design)."""
    assert [n for n, q in CASES if q.sql is None] == []
