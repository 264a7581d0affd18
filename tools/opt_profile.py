"""Optimization-round profiling harness: warm per-query timings + plans.

For each named query: run via the noop sink ``reps`` times in one warm
session, print min/median seconds, and optionally dump
``explain('formatted')`` to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/opt_profile.py [--sf DIR] [--reps N] [--plans TAG:SUFFIX]
                                [--conf k=v ...] query [query ...]

Timings here are warm (plan/codegen cached after rep 1), so they isolate
per-run computation; cross-check candidate wins against bench.py (cold,
alphabetical protocol) before claiming them.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--plans",
        default=None,
        help="TAG:SUFFIX -> dump plan to plans/TAG/<query>_SUFFIX.txt",
    )
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    from nyc_opendata_etl_spark.queries import queries
    from nyc_opendata_etl_spark.session import get_spark

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark("opt-profile", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    # absorb JVM/codegen/python-worker bootstrap (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        import os

        spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).limit(
            10_000
        ).write.format("noop").mode("overwrite").save()
        spark.range(1_000).mapInPandas(lambda it: it, "id long").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    qs = queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1
    plan_dir = suffix = None
    if args.plans:
        tag, suffix = args.plans.split(":", 1)
        plan_dir = Path(__file__).resolve().parent.parent / "plans" / tag
        plan_dir.mkdir(parents=True, exist_ok=True)

    for name in args.names:
        fn = qs[name]
        secs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt_profile:{name}#{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 3))
        if plan_dir is not None:
            df = fn(spark, args.sf)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plan_dir / f"{name}_{suffix}.txt").write_text(text)
        print(
            f"{name}: min={min(secs)} med={statistics.median(secs)} "
            f"runs={secs}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
