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


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in DIMS:
        shutil.copy(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    for name, id_cols in FACT_ID_COLS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = []
        for c in range(copies):
            tc = t
            for col in id_cols:
                idx = tc.schema.get_field_index(col)
                shifted = pc.add(tc.column(col), pa.scalar(c * SHIFT, type=pa.int64()))
                tc = tc.set_column(idx, tc.schema.field(idx), shifted)
            parts.append(tc)
        pq.write_table(pa.concat_tables(parts), os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {t.num_rows * copies}")


if __name__ == "__main__":
    main()
