"""Scale-sweep harness: run registered queries against a replica dir,
one SUBPROCESS per query, and report wall time / rows / failure class.

This codifies the round-7 sweep that found the duplicate-skew defects
(containment OOM, jaccard grind, embedding-LSH worker crash — see
BASELINE.md "Round 7" sections). Subprocess isolation is the point: a
worker OOM or a disk-full abort poisons a Spark session, so in-session
sweeps silently fail everything after the first casualty.

Usage:
    python tools/build_scale_replica.py /root/testdata/sf0.1 /tmp/spark_graft_sf10 100
    python tools/scale_sweep.py /tmp/spark_graft_sf10 [query ...]
    python tools/scale_sweep.py /tmp/spark_graft_sf10 --timeout 600

With no query names, sweeps every registered query. Output: one JSON
line per query {"query", "status": ok|error|timeout, "sec", "rows"},
plus a summary line. Queries that legitimately need cluster resources
at 100× are documented in BASELINE.md (market_basket_pairs: distinct-
pair state past one box's disk; dedup_embedding_cosine: O(n²) by
design) — a timeout/error here is a finding to triage, not necessarily
a defect.
"""

from __future__ import annotations

import json
import subprocess
import sys

_CHILD = r"""
import json, sys, time
from nyc_opendata_etl_spark.session import get_spark
from nyc_opendata_etl_spark.queries import queries
name, sf_dir = sys.argv[1], sys.argv[2]
s = get_spark("scale-sweep")
s.sparkContext.setLogLevel("ERROR")
t = time.time()
n = queries()[name](s, sf_dir).count()
print("SWEEP_RESULT " + json.dumps(
    {"query": name, "status": "ok", "sec": round(time.time() - t, 2), "rows": n}
))
"""


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    timeout = 600
    for a in sys.argv[1:]:
        if a.startswith("--timeout"):
            timeout = int(a.split("=", 1)[1]) if "=" in a else timeout
    if not args:
        print("usage: scale_sweep.py SF_DIR [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir, names = args[0], args[1:]
    if not names:
        from nyc_opendata_etl_spark.queries import queries

        names = list(queries())

    results = []
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, name, sf_dir],
                capture_output=True,
                text=True,
                timeout=timeout,
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("SWEEP_RESULT ")),
                None,
            )
            if line:
                res = json.loads(line[len("SWEEP_RESULT "):])
            else:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-15:]
                err = next(
                    (l for l in reversed(tail) if "Error" in l or "error" in l),
                    tail[-1] if tail else "no output",
                )
                res = {"query": name, "status": "error", "detail": err[:300]}
        except subprocess.TimeoutExpired:
            res = {"query": name, "status": "timeout", "sec": timeout}
        if res["status"] != "ok":
            # a killed/crashed child leaves orphaned shuffle dirs that
            # would eat the disk for every subsequent query (the round-7
            # sweep lost 77 GB to one); safe to clear between children
            # because the sweep runs them strictly sequentially.
            import glob
            import shutil

            for d in glob.glob("/tmp/blockmgr-*") + glob.glob("/tmp/spark-*"):
                shutil.rmtree(d, ignore_errors=True)
        results.append(res)
        print(json.dumps(res), flush=True)

    bad = [r for r in results if r["status"] != "ok"]
    print(
        json.dumps(
            {
                "summary": "scale_sweep",
                "sf_dir": sf_dir,
                "n": len(results),
                "ok": len(results) - len(bad),
                "failed": [r["query"] for r in bad],
            }
        )
    )


if __name__ == "__main__":
    main()
