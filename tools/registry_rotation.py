"""Print the registry-rotation state for the next round.

Reads every CORRECTNESS_r*.json in the repo root and reports, against
the current registry:
- the ``_LAST_VERIFIED`` dict to paste into queries/__init__.py (query →
  latest round with a full rows+schema+hash pass),
- rows-only runs (err == 'no_oracle') as a SEPARATE category — they are
  weaker verdicts and must not rotate out of the prefix as if
  hash-verified,
- red rows (checked but not fully green — fix before anything else),
- queries with NO driver verdict yet (must lead the registry),
- whether the must-verify set fits the driver's ~50-entry prefix.

Usage: python tools/registry_rotation.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    from nyc_opendata_etl_spark.queries import REGISTRY, _load_all

    _load_all()
    registry = list(REGISTRY)
    last_green: dict[str, int] = {}
    last_rows_only: dict[str, int] = {}
    last_red: dict[str, int] = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[-1])
        for name, row in json.loads(f.read_text()).items():
            # a later round's verdict supersedes an earlier one
            if row.get("hash_match"):
                last_green[name] = rnd
                last_rows_only.pop(name, None)
                last_red.pop(name, None)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                last_rows_only[name] = rnd
                last_red.pop(name, None)
            else:
                last_red[name] = rnd
                last_green.pop(name, None)
                last_rows_only.pop(name, None)

    reg_pos = {n: i for i, n in enumerate(registry)}
    print(f"registry: {len(registry)} queries")
    print("\n_LAST_VERIFIED (full hash pass) — paste into queries/__init__.py:")
    for n, rnd in sorted(
        last_green.items(), key=lambda kv: (kv[1], reg_pos.get(kv[0], 10**6))
    ):
        if n in reg_pos:
            print(f'    "{n}": {rnd},')
    rows_only = [n for n in registry if n in last_rows_only]
    print(f"\nrows-only (weak verdict, keep near the front) ({len(rows_only)}):")
    for n in rows_only:
        print(f"    {n}  (last rows-only pass r{last_rows_only[n]})")
    red = [n for n in registry if n in last_red]
    print(f"\nred ({len(red)}) — fix first, keep at the very front:")
    for n in red:
        print(f"    {n}  (r{last_red[n]})")
    seen = set(last_green) | set(last_rows_only) | set(last_red)
    unchecked = [n for n in registry if n not in seen]
    print(f"\nnever-checked ({len(unchecked)}) — must lead the registry:")
    for n in unchecked:
        print(f"    {n}")
    cap = 50
    need = len(red) + len(unchecked) + len(rows_only)
    print(
        f"\nprefix budget: {need} queries need a (re)verdict; driver checks "
        f"~{cap} per round → {'fits' if need <= cap else 'DOES NOT FIT — defer some'};"
        f" {cap - need if need <= cap else 0} slots left for stalest greens"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
