"""Print the registry-rotation state for the next round.

Reads every CORRECTNESS_r*.json in the repo root and reports, against
the current registry:
- queries with a green driver verdict (hash_match, or rows-only with no
  error) — candidates for the _DRIVER_GREEN_* tuple in
  queries/__init__.py,
- queries with NO driver verdict yet (must lead the registry),
- red rows (fix before anything else).

Usage: python tools/registry_rotation.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    from nyc_opendata_etl_spark.queries import _ordered

    registry = list(_ordered())
    verdicts: dict[str, bool] = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            # a later round's verdict supersedes an earlier one
            verdicts[name] = ok
    green = [n for n in registry if verdicts.get(n)]
    red = [n for n in registry if n in verdicts and not verdicts[n]]
    unchecked = [n for n in registry if n not in verdicts]
    print(f"registry: {len(registry)} queries")
    print(f"\ndriver-green ({len(green)}) — paste into the green tuple:")
    for n in green:
        print(f'    "{n}",')
    print(f"\nred ({len(red)}) — fix first, keep at the very front:")
    for n in red:
        print(f"    {n}")
    print(f"\nnever-checked ({len(unchecked)}) — must lead the registry:")
    for n in unchecked:
        print(f"    {n}")
    cap = 50
    need = len(red) + len(unchecked)
    print(
        f"\nprefix budget: {need} queries need a verdict; driver checks ~{cap} "
        f"per round → {'fits' if need <= cap else 'DOES NOT FIT — defer some'}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
