"""Prebuild every write-time staged artifact for a table directory.

The engine stages derived artifacts once per source version (the
lakehouse write-time work): BM25 posting lists, the incremental text
index, the IVF-PQ index, the bucketed co-purchase edge relation, the
z-ordered events copy, the time-ordered streaming bronze copy, and the
CSV/JSONL/ORC format stages. Queries amortize these; the FIRST query
after a source-version change pays the build.

This tool runs all builders up front so a following bench/sweep run
measures pure query cost (the steady-state number a cluster sees),
never a build — and so the build cost itself is measured and printed
per artifact instead of silently folded into whichever query ran
first.

Usage:
    python tools/stage_warmup.py [sf_dir]        # default /root/testdata/sf0.1
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from nyc_opendata_etl_spark.session import get_spark

    spark = get_spark("stage-warmup")
    spark.sparkContext.setLogLevel("ERROR")

    from nyc_opendata_etl_spark.queries.event_windows import (
        _stage_events,
        _stage_events_zordered,
    )
    from nyc_opendata_etl_spark.queries.llm_ops import (
        _stage_ivfpq_index,
        _stage_text_index,
        _stage_text_index_incremental,
    )
    from nyc_opendata_etl_spark.queries.parity import _stage_documents
    from nyc_opendata_etl_spark.queries.relational import _stage_copurchase_edges

    builders = [
        ("text_index (BM25 postings)", lambda: _stage_text_index(spark, sf_dir)),
        (
            "text_index_incr (incremental postings)",
            lambda: _stage_text_index_incremental(spark, sf_dir),
        ),
        ("ivfpq_index (ANN codebooks)", lambda: _stage_ivfpq_index(spark, sf_dir)),
        (
            "copurchase_edges (bucketed graph)",
            lambda: _stage_copurchase_edges(spark, sf_dir),
        ),
        ("events_zordered (layout)", lambda: _stage_events_zordered(spark, sf_dir)),
        (
            "stream bronze (time-ordered)",
            lambda: _stage_events(spark, sf_dir),
        ),
        ("documents.csv", lambda: _stage_documents(spark, sf_dir, "csv")),
        ("documents.jsonl", lambda: _stage_documents(spark, sf_dir, "jsonl")),
        ("documents.orc", lambda: _stage_documents(spark, sf_dir, "orc")),
    ]
    total = 0.0
    for label, build in builders:
        t0 = time.time()
        path = build()
        dt = time.time() - t0
        total += dt
        state = "built" if dt > 1.0 else "warm"
        print(f"{state:5s} {dt:7.1f}s  {label}  -> {path}")
    print(f"total {total:7.1f}s  ({sf_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
