"""Physical-plan inspection helpers.

The engine's scale guarantees are *plan shapes*, not hopes: dim joins
must broadcast, filters must reach the parquet scan, global top-k must
plan as TakeOrderedAndProject, hot paths must stay inside whole-stage
codegen. These helpers turn those guarantees into assertions the test
suite enforces (tests/test_plans.py), so a regression that silently
flips a broadcast join to a sort-merge join or un-pushes a predicate
fails CI instead of surfacing as a 100 TB incident.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text of a DataFrame's physical plan."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def final_plan(df: DataFrame) -> str:
    """The ADAPTIVE FINAL physical plan: execute the DataFrame (AQE
    finalizes the plan only on execution), then return the explain
    text with the ``== Initial Plan ==`` section stripped — the
    pre-AQE plan would otherwise leak stale operators (e.g. a
    SortMergeJoin that AQE converted to broadcast) into assertions
    about what actually ran."""
    df.collect()
    text = formatted_plan(df)
    cut = text.find("== Initial Plan ==")
    return text if cut < 0 else text[:cut]


def final_uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in final_plan(df)


def count_node(df: DataFrame, node: str) -> int:
    """Occurrences of a physical operator (e.g. "BroadcastHashJoin",
    "Exchange", "SortMergeJoin") in the plan."""
    return len(re.findall(re.escape(node), formatted_plan(df)))


def uses_broadcast_join(df: DataFrame) -> bool:
    return count_node(df, "BroadcastHashJoin") > 0


def uses_sort_merge_join(df: DataFrame) -> bool:
    return count_node(df, "SortMergeJoin") > 0


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (pre-AQE).

    ``explain("formatted")`` prints each operator once as a numbered
    detail header ``(n) Exchange``; broadcast exchanges print as
    ``(n) BroadcastExchange`` and are not shuffles.
    """
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """The parquet-scan PushedFilters lists, one string per scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if any scan's pushed-filter list mentions ``fragment``
    (e.g. a column name or "GreaterThan")."""
    return any(fragment in fs for fs in pushed_filters(df))


def read_schemas(df: DataFrame) -> list[str]:
    """The parquet-scan ReadSchema strings — inspect for column pruning."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def is_take_ordered(df: DataFrame) -> bool:
    """True if the plan computes a global top-k without a full sort."""
    return count_node(df, "TakeOrderedAndProject") > 0


def _walk_logical(node, out):
    out.append(node)
    for i in range(node.children().size()):
        _walk_logical(node.children().apply(i), out)
    return out


def global_window_classes(df: DataFrame) -> list[str]:
    """Boundedness class of every PARTITION-LESS Window in the
    optimized logical plan — the audit behind the bounded-global-window
    pin (round 12). A global window executes as a single-task sort, so
    every such site must prove its input bounded; the class names the
    proof found in the window's input subtree:

    - ``limit``       — a GlobalLimit bounds the rows
    - ``scalar_agg``  — a grouping-less Aggregate (exactly one row)
    - ``local``       — a literal LocalRelation
    - ``grouped_agg`` — an Aggregate grouped on domain columns (bounded
                        by value cardinality, not row count — caller
                        must justify the domain, e.g. source names)
    - ``unbounded``   — none of the above (a scale defect unless the
                        query documents itself as an exact anchor with
                        a registered approx twin)
    """
    lp = df._jdf.queryExecution().optimizedPlan()
    classes: list[str] = []
    for node in _walk_logical(lp, []):
        if node.nodeName() != "Window" or node.partitionSpec().size() != 0:
            continue
        cls = "unbounded"
        for sub in _walk_logical(node, [])[1:]:
            nn = sub.nodeName()
            if nn in ("GlobalLimit", "LocalRelation"):
                cls = "limit" if nn == "GlobalLimit" else "local"
                break
            if nn == "Aggregate":
                cls = (
                    "scalar_agg"
                    if sub.groupingExpressions().isEmpty()
                    else "grouped_agg"
                )
                break
        classes.append(cls)
    return classes
