"""Mechanical per-query bench comparison across rounds.

The box's measured inter-session drift is ±60% on identical code
(BASELINE.md; re-measured round 7: 228.7 → 309.9 s two hours apart), so
ROUND TOTALS never support a regression claim — only per-query ratios
read against that band do. This tool does the archaeology the judge and
builder previously did by hand: it pairs the two most recent
``BENCH_DETAIL_r*.json`` files (or any two passed explicitly) and
reports, per query, the new/old ratio classified against the drift
band:

- ``REGRESSED``  ratio > drift_hi   (outside the band — investigate)
- ``IMPROVED``   ratio < drift_lo   (genuinely faster, or fixed)
- ``~``          inside the band    (not distinguishable from drift)
- ``NEW`` / ``GONE``                (present on only one side)

Usage:
    python tools/bench_diff.py                    # latest two rounds
    python tools/bench_diff.py OLD.json NEW.json  # explicit files
    python tools/bench_diff.py --band=0.6         # override drift band

Output: one human table (sorted worst ratio first) + one JSON summary
line for scripts. Exit code 0 always — drift classification is a
reading aid, not a gate; the correctness gate is check_correctness.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _latest_two() -> tuple[Path, Path]:
    files = sorted(
        ROOT.glob("BENCH_DETAIL_r*.json"),
        key=lambda p: int(re.search(r"_r(\d+)", p.stem).group(1)),
    )
    if len(files) < 2:
        print(
            f"need two BENCH_DETAIL_r*.json files, found {len(files)}",
            file=sys.stderr,
        )
        sys.exit(2)
    return files[-2], files[-1]


def main() -> int:
    band = 0.6
    paths = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--band" or a.startswith("--band="):
            # accept --band=X and --band X (mirrors scale_sweep.py)
            if "=" in a:
                val = a.split("=", 1)[1]
            elif i + 1 < len(argv):
                i += 1
                val = argv[i]
            else:
                print("--band requires a value", file=sys.stderr)
                return 2
            try:
                band = float(val)
            except ValueError:
                print(f"invalid --band value: {val!r}", file=sys.stderr)
                return 2
        else:
            paths.append(Path(a))
        i += 1
    if len(paths) == 2:
        old_p, new_p = paths
    elif not paths:
        old_p, new_p = _latest_two()
    else:
        print("usage: bench_diff.py [OLD.json NEW.json] [--band=0.6]", file=sys.stderr)
        return 2

    old_doc = json.loads(old_p.read_text())
    new_doc = json.loads(new_p.read_text())
    old, new = old_doc["queries"], new_doc["queries"]
    # Rows measured under a host-steal storm on EITHER side are excluded
    # from regression/improvement classification — the timing is noise
    # (bench.py records per-row /proc/stat steal and flags rows above
    # its threshold; older round files without the field flag nothing).
    stealy = set(old_doc.get("steal_flagged", [])) | set(
        new_doc.get("steal_flagged", [])
    )
    # Rows whose official timing came from a storm-triggered RE-RUN on
    # either side are banded separately too (round-11 advisor): the
    # re-run executes with plan/codegen and page cache already hot, so
    # its timing is warm-biased — an IMPROVED verdict built on one is a
    # measurement artifact, not a win. bench.py records these in
    # steal_reruns (first-attempt sec + steal preserved for the record).
    rerun = set(old_doc.get("steal_reruns", {})) | set(
        new_doc.get("steal_reruns", {})
    )
    lo, hi = 1.0 / (1.0 + band), 1.0 + band

    rows = []
    for q in sorted(set(old) | set(new)):
        o, n = old.get(q), new.get(q)
        if o is None:
            rows.append((float("inf"), q, o, n, "NEW"))
        elif n is None:
            rows.append((-1.0, q, o, n, "GONE"))
        elif o <= 0 or n <= 0:
            rows.append((float("inf"), q, o, n, "ERRORED"))
        else:
            r = n / o
            if q in stealy:
                cls = "STEAL"
            elif q in rerun:
                # warm-biased official row — report the ratio but keep
                # it out of REGRESSED/IMPROVED evidence
                cls = "RERUN"
            else:
                cls = "REGRESSED" if r > hi else "IMPROVED" if r < lo else "~"
            rows.append((r, q, o, n, cls))

    rows.sort(key=lambda t: -t[0])
    print(f"# {old_p.name} -> {new_p.name}  (drift band ratio [{lo:.2f}, {hi:.2f}])")
    print(f"{'query':<34} {'old_s':>8} {'new_s':>8} {'ratio':>6}  class")
    for r, q, o, n, cls in rows:
        if cls == "~" and len(rows) > 40:
            continue  # big suites: print only the signal
        ratio = "" if o is None or n is None or o <= 0 or n <= 0 else f"{r:.2f}"
        print(
            f"{q:<34} {o if o is not None else '':>8} "
            f"{n if n is not None else '':>8} {ratio:>6}  {cls}"
        )
    in_band = sum(1 for r in rows if r[4] == "~")
    print(
        json.dumps(
            {
                "summary": "bench_diff",
                "old": old_p.name,
                "new": new_p.name,
                "n": len(rows),
                "in_band": in_band,
                "regressed": [q for _, q, _, _, c in rows if c == "REGRESSED"],
                "improved": [q for _, q, _, _, c in rows if c == "IMPROVED"],
                "steal_excluded": [q for _, q, _, _, c in rows if c == "STEAL"],
                "rerun_excluded": [q for _, q, _, _, c in rows if c == "RERUN"],
                "added": [q for _, q, _, _, c in rows if c == "NEW"],
                "removed": [q for _, q, _, _, c in rows if c == "GONE"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
