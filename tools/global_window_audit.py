"""Registry-wide audit of partition-less Window sites.

A global (partition-less) window executes as a single-task sort — fine
over a provably bounded relation, a 100 TB incident otherwise. This
tool builds every registered query's plan at sf0.001 and reports each
query that contains a global window together with the boundedness
class of every such site (plans/inspect.global_window_classes).

The known sites are PINNED in tests/test_plans.py
(test_global_windows_are_bounded); run this tool after adding queries
and extend the pin table — an unlisted global window is a review
finding, not background noise.

Usage: python tools/global_window_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nyc_opendata_etl_spark.plans.inspect import global_window_classes  # noqa: E402
from nyc_opendata_etl_spark.queries import queries  # noqa: E402
from nyc_opendata_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("gw-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name, fn in sorted(queries().items()):
        try:
            classes = global_window_classes(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — audit must survive one bad query
            print(json.dumps({"query": name, "error": f"{type(e).__name__}: {e}"}))
            continue
        if classes:
            flagged += 1
            print(json.dumps({"query": name, "global_windows": classes}))
    print(json.dumps({"summary": "global_window_audit", "queries_with_global_windows": flagged}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
