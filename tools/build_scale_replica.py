"""Build the 10x scale replica used for BASELINE.md's scale-up tables.

Replicates the fact-like tables of an sf dir N times with per-copy id
shifts (identical texts/vectors across copies form real duplicate
groups, stressing dedup the way production corpora do); dimension
tables (region/nation/customer/supplier/part) are carried through
unchanged — at scale facts grow, dims stay bounded, which is exactly
the regime the broadcast-join plans are designed for.

Usage: python tools/build_scale_replica.py [src_sf_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1 10
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns shifted by copy_index * SHIFT (facts replicate);
# absent -> single unshifted copy (dimensions).
SHIFT = 100_000_000
FACT_ID_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation", "customer", "supplier", "part")


# --extend-time: also shift event timestamps by copy_index × the source
# time span, so N× more rows cover N× more wall-clock instead of N×
# the density in a fixed range. This is the honest model of organic
# growth for time-band operators (interval joins, watermarked windows):
# per-band candidate counts and in-flight watermark state should stay
# FLAT under it, whereas the default same-range replica multiplies band
# density and grows time-band join work quadratically (the
# stream_interval_join 100× finding, VERDICT r7 wrong-list #3).
TIME_COLS = {"events": ["ts"]}


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    extend_time = "--extend-time" in sys.argv[1:]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    dst = argv[1] if len(argv) > 1 else "/tmp/spark_graft_sf1"
    copies = int(argv[2]) if len(argv) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    for name in DIMS:
        shutil.copy(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    for name, id_cols in FACT_ID_COLS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        time_cols = TIME_COLS.get(name, []) if extend_time else []
        spans = {}
        for col in time_cols:
            mm = pc.min_max(t.column(col)).as_py()
            # whole-day span so copies tile the timeline contiguously
            span_us = mm["max"] - mm["min"]
            spans[col] = ((int(span_us.total_seconds()) // 86400) + 1) * 86400
        parts = []
        for c in range(copies):
            tc = t
            for col in id_cols:
                idx = tc.schema.get_field_index(col)
                shifted = pc.add(tc.column(col), pa.scalar(c * SHIFT, type=pa.int64()))
                tc = tc.set_column(idx, tc.schema.field(idx), shifted)
            for col in time_cols:
                idx = tc.schema.get_field_index(col)
                unit = tc.schema.field(idx).type.unit
                per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
                shifted = pc.add(
                    tc.column(col),
                    pa.scalar(c * spans[col] * per_s, type=pa.duration(unit)),
                )
                tc = tc.set_column(idx, tc.schema.field(idx), shifted)
            parts.append(tc)
        pq.write_table(pa.concat_tables(parts), os.path.join(dst, f"{name}.parquet"))
        note = f" (ts tiled by {spans} s/copy)" if spans else ""
        print(f"{name}: {t.num_rows} -> {t.num_rows * copies}{note}")


if __name__ == "__main__":
    main()
