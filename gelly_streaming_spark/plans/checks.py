"""Physical-plan assertions — the engine's guard rails for scale.

Correctness tests prove the answers match; these prove the *plans* stay
shaped for 100 TB: filters reach the parquet scan, small sides broadcast,
nothing degenerates into a cartesian product, and hot expressions stay
inside whole-stage codegen. Used in tests/test_plans.py so a regression
in plan shape fails CI, not a production run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a PushedFilters list of some scan."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed to scan:\n{joined}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins:\n{plan[:2000]}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan[:2000]}"


def assert_wholestage_codegen(df: DataFrame, min_spans: int = 1) -> None:
    # With AQE on, an unexecuted plan is AdaptiveSparkPlan isFinalPlan=false
    # and reports zero codegen subtrees; execute once so AQE finalizes.
    # The action must run THIS DataFrame's own QueryExecution (df.count()
    # builds a new aggregated one and leaves this plan unfinalized) while
    # hauling no rows to the driver (df.collect() did, defeating the
    # point of a plan assertion meant for large-input shapes): a JVM-side
    # count over the same execution's RDD does both.
    import re

    df._jdf.queryExecution().toRdd().count()  # noqa: SLF001
    plan = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    n = int(m.group(1)) if m else 0
    assert n >= min_spans, f"expected ≥{min_spans} codegen spans, got {n}"
