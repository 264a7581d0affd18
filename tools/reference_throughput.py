"""Measure the reference's execution model on this machine, for
BASELINE.md's throughput comparison.

The reference engine's hot paths are single-threaded pandas row-applies
(SURVEY §2 "UDF surface"): the MD5 surrogate-key apply (7 call sites,
e.g. etl/core/key_mapper.py:24), strftime date/time-key appliers
(load_311.py:50-63), and the AM/PM time-parser apply
(load_parking.py:113). This script re-times those exact idioms (same
formulas, same row-at-a-time shape — written fresh here, not copied) on
synthetic data of bench scale, giving the single-node numbers our Spark
plans must beat at equal row counts.

Usage: python tools/reference_throughput.py [n_rows]
"""

from __future__ import annotations

import datetime
import hashlib
import sys
import time

import numpy as np
import pandas as pd


def make_frame(n: int) -> pd.DataFrame:
    rng = np.random.RandomState(7)
    base = datetime.datetime(2020, 1, 1)
    return pd.DataFrame(
        {
            "a": [f"agency {i % 50}" for i in range(n)],
            "b": [f"name {i % 200}" for i in range(n)],
            "ts": [
                (base + datetime.timedelta(minutes=int(m))).isoformat()
                for m in rng.randint(0, 500_000, n)
            ],
            "vtime": [
                f"{(i % 12) + 1:02d}{i % 60:02d}{'AP'[i % 2]}" for i in range(n)
            ],
        }
    )


def t(label: str, fn) -> float:
    t0 = time.time()
    fn()
    sec = time.time() - t0
    print(f"{label}: {sec:.2f}s")
    return sec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    df = make_frame(n)
    print(f"rows: {n}")

    def hash_key_apply():
        # the reference's utils.py:5-8 formula via df.apply(axis=1)
        df.apply(
            lambda r: int(
                hashlib.md5("|".join(str(v) for v in (r["a"], r["b"])).encode())
                .hexdigest(),
                16,
            )
            % 10**9,
            axis=1,
        )

    def date_keys():
        ts = pd.to_datetime(df["ts"], errors="coerce")
        ts.dt.strftime("%Y%m%d").astype("Int64")
        ts.apply(lambda x: x.hour * 10000 + x.minute * 100)

    def ampm_parse():
        def parse(s):
            s = s.strip().upper()
            if not s or s[-1] not in ("A", "P"):
                return None
            core = s[:-1]
            if ":" not in core and len(core) in (3, 4):
                core = core[:-2].zfill(2) + ":" + core[-2:]
            try:
                return datetime.datetime.strptime(
                    core + s[-1] + "M", "%I:%M%p"
                ).time()
            except ValueError:
                return None

        df["vtime"].apply(parse)

    total = 0.0
    total += t("md5 surrogate key (row apply)", hash_key_apply)
    total += t("timestamp parse + date/time keys", date_keys)
    total += t("AM/PM time parse (row apply)", ampm_parse)
    print(f"total hot-path time: {total:.2f}s "
          f"({n / total:,.0f} rows/s single-threaded)")


if __name__ == "__main__":
    main()
