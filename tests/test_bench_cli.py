"""End-to-end guard for the bench delivery contract: the driver records
only the LAST 2000 chars of bench.py's output and parses one JSON line
out of that tail — two rounds were lost to delivery failures (truncated
line, timeout with nothing printed), so the delivery chain itself is
regression-tested here, as a real subprocess.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tail_line(stdout: str) -> dict:
    """Parse exactly as the driver does: the last JSON line within the
    final 2000 characters of output."""
    tail = stdout[-2000:]
    lines = [l for l in tail.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON line in tail: {tail!r}"
    return json.loads(lines[-1])


def test_bench_budget_stop_emits_parseable_tail(sf_dir):
    """A budget-limited run must end rc=0 with a parseable compact line
    in the 2000-char tail, partial flagged, no spurious errors from
    budget truncation, and a detail file matching the headline."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS="8",
        BENCH_BUDGET_SEC="45",
        BENCH_RUNS="1",
        BENCH_DUCKDB="0",
    )
    detail_path = os.path.join(REPO, "bench_detail.json")
    saved = None
    if os.path.exists(detail_path):
        with open(detail_path) as fh:
            saved = fh.read()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            timeout=240,
            cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-500:]
        d = _tail_line(proc.stdout)
        assert d["metric"] == "total_wallclock_declared_queries"
        assert d["registered_queries"] >= 48
        assert d["comparable_queries"] >= 1
        # budget truncation must NOT masquerade as per-query errors
        assert d["errors_present"] is False, d.get("errored_queries")
        assert len(json.dumps(d)) < 1900
        with open(detail_path) as fh:
            detail = json.load(fh)
        assert detail["comparable_queries"] == d["comparable_queries"]
        assert detail["value"] == d["value"]
    finally:
        # the real detail file belongs to the last REAL bench run —
        # restore it so this test never clobbers a committed artifact
        if saved is not None:
            with open(detail_path, "w") as fh:
                fh.write(saved)
