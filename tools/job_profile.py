"""Job-count profiler: for each named query, report wall seconds AND the
number of Spark jobs/stages/tasks it submitted (from the app status
store, which sees jobs from every thread — including Structured
Streaming micro-batch threads, where job-group tagging can't reach).

The streaming micro-batch family is job-count-bound at bench scale
(VERDICT r16 item 1): per-batch fixed overhead (plan analysis, job
scheduling, offset/commit log) dominates over data. This tool makes
"fold per-batch actions into fewer jobs" measurable.

Usage:
    python tools/job_profile.py [--sf DIR] [--reps N] query [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _counts(spark) -> tuple[int, int, int]:
    """(n_jobs, n_stages, n_tasks) from the app status store."""
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n_jobs = jobs.size()
    n_stages = 0
    n_tasks = 0
    for i in range(n_jobs):
        j = jobs.apply(i)
        n_stages += j.stageIds().size()
        n_tasks += j.numTasks()
    return n_jobs, n_stages, n_tasks


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from nyc_opendata_etl_spark.queries import queries
    from nyc_opendata_etl_spark.session import get_spark

    spark = get_spark("job-profile")
    spark.sparkContext.setLogLevel("ERROR")
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

    for name in args.names:
        fn = qs[name]
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"job_profile:{name}#{i}")
            j0, s0, t0c = _counts(spark)
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            j1, s1, t1c = _counts(spark)
            print(
                f"{name} rep{i}: {sec}s  jobs={j1 - j0} "
                f"stages={s1 - s0} tasks={t1c - t0c}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
