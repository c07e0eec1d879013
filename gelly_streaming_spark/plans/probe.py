"""Bounded driver probes with a size-adapted execution shape.

Several adaptive fast paths take ``limit(N+1)`` and collect: if the
input fits the bound, solve driver-local; else fall back to the
distributed plan (connected components' union-find, bipartiteness' BFS,
the triangle kernel's broadcast build side, the Jaccard bitset vocab
probe). Spark executes CollectLimit INCREMENTALLY — 1 partition first,
then ``spark.sql.limit.scaleUpFactor``× more per round — which is
exactly right when the bound overflows early on a big input (one task,
bail out), but makes a small input pay a sequential driver round-trip
PER ROUND: measured 3–4 jobs to drain a 13-row fixture union, ~1 s of
pure scheduling at the bench's per-job floor.

``bounded_take`` picks the shape from Catalyst's optimized-plan size
estimate — the same stats-driven decision AQE makes for join strategy:

- small estimate → run every partition in ONE job
  (``spark.sql.limit.initialNumPartitions`` = max): the probe expects
  to take the whole input anyway;
- large or unknown estimate → keep the incremental default: a 100 TB
  input must never get a full-width job for a probe its first partition
  already satisfies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Inputs estimated under this are drained in one job. Matches the order
# of a broadcast-join build side: comfortably driver-collectable.
_ONE_PASS_BYTES = 64 << 20
_CONF = "spark.sql.limit.initialNumPartitions"


def _estimated_bytes(df: DataFrame) -> int:
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # noqa: SLF001
        )
    except Exception:
        return 1 << 62  # unknown — treat as large, keep incremental


def bounded_take(df: DataFrame, n: int, as_arrow: bool = False):
    """Collect at most ``n + 1`` rows of ``df`` (the ``+1`` is the
    caller's overflow sentinel) as a list of Rows, or a
    ``pyarrow.Table`` with ``as_arrow=True``."""
    spark = df.sparkSession
    limited = df.limit(n + 1)
    one_pass = _estimated_bytes(df) <= _ONE_PASS_BYTES
    old = spark.conf.get(_CONF, None) if one_pass else None
    if one_pass:
        spark.conf.set(_CONF, str(1 << 30))
    try:
        return limited.toArrow() if as_arrow else limited.collect()
    finally:
        if one_pass:
            if old is None:
                spark.conf.unset(_CONF)
            else:
                spark.conf.set(_CONF, old)
