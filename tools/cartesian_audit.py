"""Registry-wide audit for CartesianProduct physical nodes.

A CartesianProductExec is the unbounded all-pairs disaster at 100 TB:
it appears when a join has no equi-condition AND neither side is small
enough (or hinted) to broadcast. Every deliberate cross join in this
engine broadcasts a provably tiny side (1-row stats relations, bounded
candidate sets, small band tables), which plans as
BroadcastNestedLoopJoin — so the expected registry-wide
CartesianProduct count is ZERO. This tool builds every registered
query's plan at sf0.001 and reports any query whose executed plan
contains the node; the crossJoin-using queries are additionally PINNED
in tests/test_plans.py (test_no_cartesian_products) so a regression
fails the suite, mirroring the global-window audit's tool+pin shape.

Usage: python tools/cartesian_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nyc_opendata_etl_spark.queries import queries  # noqa: E402
from nyc_opendata_etl_spark.session import get_spark  # noqa: E402


def cartesian_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("CartesianProduct")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("cartesian-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name, fn in sorted(queries().items()):
        try:
            n = cartesian_count(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — audit must survive one bad query
            print(json.dumps({"query": name, "error": f"{type(e).__name__}: {e}"}))
            continue
        if n:
            flagged += 1
            print(json.dumps({"query": name, "cartesian_products": n}))
    print(
        json.dumps(
            {"summary": "cartesian_audit", "queries_with_cartesians": flagged}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
