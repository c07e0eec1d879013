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


def test_certification_window_order():
    """The driver's correctness harness records the FIRST 50 entries of
    queries() in iteration order (r8 lesson: q38-q49 registered last got
    no CORRECTNESS row at all; r9 lesson: evidence goes stale when code
    changes). Lock the CHANGE-AWARE export-order contract: self-stale /
    never-certified queries lead the window, every SURVEY §2 row stays
    inside it, unknown future names sort before everything."""
    from gelly_streaming_spark.certify import WINDOW, self_stale_queries
    from gelly_streaming_spark.queries import _CERT_ORDER, oracle_sql, queries

    names = list(queries())
    assert set(names) == set(REGISTRY)
    assert set(_CERT_ORDER) == set(REGISTRY), (
        "every registered query must appear in _CERT_ORDER exactly once — "
        "update the list when adding queries"
    )
    window = names[:WINDOW]
    # the urgent band (own code/SQL changed since last certified row, or
    # never certified) leads the window — this is the r9 verdict's
    # mechanical guard
    urgent = self_stale_queries()
    assert set(window[: len(urgent)]) == urgent
    # every §2 reference-operator row is either INSIDE the window (gets
    # a fresh driver row this round) or FRESH (its manifest entry
    # matches shipped code, so its existing driver row still certifies
    # it — the change-aware model's whole point). A §2 row that is
    # stale AND outside the window would ship uncertified changed code.
    from gelly_streaming_spark.certify import stale_queries

    s2_ids = {
        "q01", "q02", "q03", "q04", "q05", "q05b", "q06", "q07", "q08",
        "q09", "q10", "q11", "q11b", "q12", "q12c", "q12d", "q13", "q14",
        "q15", "q15b", "q15c", "q15d", "q15e", "q15f", "q16", "q17",
        "q18", "q19b", "q20", "q20b", "q25s", "q26s", "q27s", "q28s",
        "q29s", "q30",
    }
    in_window_ids = {n.split("_", 1)[0] for n in window}
    stale_ids = {n.split("_", 1)[0] for n in stale_queries()}
    uncovered = s2_ids & stale_ids - in_window_ids
    assert not uncovered, f"stale §2 rows outside the window: {uncovered}"
    # oracle_sql iterates in the same order (driver zips the two)
    assert list(oracle_sql()) == [
        n for n in names if REGISTRY[n].sql is not None
    ]
    # a future (unknown) name must sort before everything
    from gelly_streaming_spark import certify
    from gelly_streaming_spark.queries import _export_order

    REGISTRY["q99_future"] = REGISTRY[names[0]]
    certify._reset_cache()
    try:
        assert _export_order()[0] == "q99_future"
    finally:
        del REGISTRY["q99_future"]
        certify._reset_cache()
