"""Plan-inspection helpers: capture .explain output for audits/tests."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string (PySpark only prints it)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join in plan:\n{plan}")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan (scan pushdown
    audit)."""
    plan = explain_str(df, "formatted")
    return "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)
