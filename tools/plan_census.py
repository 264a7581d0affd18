"""Full-registry physical-plan node census: one row per registered
query counting Exchange / scan / Python-boundary / join / window nodes
in the formatted physical plan, plus plan errors.

The optimization-round triage artifact: queries whose census row shows
no Exchange, no Python boundary and one scan are scan-local expression
work with nothing to remove; high Exchange/scan counts mark the plans
worth reading. Also the global anti-pattern audit in one pass (expect
0 CartesianProduct and 0 BatchEvalPython everywhere; Arrow nodes only
in the documented codec/tokenizer kernels).

Usage:
    python tools/plan_census.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nyc_opendata_etl_spark.queries import queries  # noqa: E402
from nyc_opendata_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_census.json"
    spark = get_spark("plan-census")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name, fn in sorted(queries().items()):
        try:
            df = fn(spark, sf)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # census rows must cover every query
            out[name] = {"error": str(e)[:120]}
            continue
        out[name] = {
            "exchange": len(re.findall(r"\bExchange\b", p)),
            "bexchange": p.count("BroadcastExchange"),
            "scans": sum(
                p.count(f"Scan {fmt}") for fmt in ("parquet", "csv", "orc", "json", "text")
            ),
            "rdd": p.count("Scan ExistingRDD"),
            "py": p.count("BatchEvalPython"),
            "arrow": p.count("ArrowEvalPython")
            + p.count("MapInPandas")
            + p.count("FlatMapGroupsInPandas"),
            "cart": p.count("CartesianProduct"),
            "bnlj": p.count("BroadcastNestedLoopJoin"),
            "smj": p.count("SortMergeJoin"),
            "window": len(re.findall(r"\bWindow\b", p)),
        }
    json.dump(out, open(out_path, "w"), indent=0)
    errs = [k for k, v in out.items() if "error" in v]
    carts = [k for k, v in out.items() if v.get("cart")]
    pys = [k for k, v in out.items() if v.get("py")]
    print(
        json.dumps(
            {
                "queries": len(out),
                "errors": errs,
                "cartesian": carts,
                "batch_eval_python": pys,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
