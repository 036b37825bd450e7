#!/usr/bin/env python
"""Generate a scaled-up copy of the driver testdata for scale-stress
runs (VERDICT r2 #7: "run the headline bench + shuffle audit one order
of magnitude up and record which plans change shape").

/root/testdata is read-only, so this derives sfN data into a writable
dir by k-fold replication of sf0.1 with per-replica KEY SHIFTING: for
replica i every entity key k becomes k + i*STRIDE (same stride on the
FK side, so referential integrity and per-key densities — join fanout,
group sizes, dup rates — are preserved; this is how TPC-H itself
scales: more keys, same distributions). Dimension AND fact tables
both replicate, matching true scale-factor growth.

Non-key columns are copied verbatim per replica, so value
distributions (dates, prices, event types, text, embeddings) are
identical to the source sf — only cardinalities grow.

Usage:  python scripts/gen_scaled_testdata.py [k] [out_dir] [--skew]
        (defaults: k=10 → sf1-equivalent, out=/tmp/testdata_sf1)

``--skew`` additionally redirects HALF of every replica's orders and
lineitems to replica-0's key space on the FK side (o_custkey /
l_suppkey keep their base-replica values), concentrating ~55% of the
fact rows on 10% of the dimension keys — the hot-key shape that
triggers AQE skew-join splitting and that salting exists for.
Per-key PK uniqueness is preserved (only FKs are skewed).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key columns to shift, per table (column → stride name)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# shared strides: FK and PK must shift identically
STRIDE_OF = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}
# tiny fixed dims: copy as-is (5 regions / 25 nations at every sf)
COPY = ["region", "nation"]


# FK columns whose shift is SKIPPED on even row indices under --skew
# (those rows keep pointing at replica-0 dimension keys)
_SKEW_FKS = {"o_custkey", "l_suppkey"}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    k = int(args[0]) if len(args) > 0 else 10
    out_dir = args[1] if len(args) > 1 else "/tmp/testdata_sf1"
    os.makedirs(out_dir, exist_ok=True)

    # stride = next power of ten above the max of every column sharing it
    strides: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for name in list(KEYS) + COPY:
        tables[name] = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    for name, cols in KEYS.items():
        for col in cols:
            mx = pc.max(tables[name][col]).as_py() or 0
            s = STRIDE_OF[col]
            strides[s] = max(strides.get(s, 0), int(mx) + 1)
    for s in strides:
        p = 1
        while p < strides[s]:
            p *= 10
        strides[s] = p

    for name in COPY:
        pq.write_table(tables[name], os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: copied ({tables[name].num_rows} rows)")

    for name, cols in KEYS.items():
        src = tables[name]
        replicas = []
        for i in range(k):
            t = src
            for col in cols:
                shift = i * strides[STRIDE_OF[col]]
                if not shift:
                    continue
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t[col], pa.scalar(shift, t[col].type))
                if skew and col in _SKEW_FKS:
                    # half of each replica's rows keep replica-0 FKs →
                    # hot dimension keys carrying ~(k+1)/2k of the facts
                    import numpy as np

                    mask = pa.array(np.arange(t.num_rows) % 2 == 0)
                    shifted = pc.if_else(mask, t[col], shifted)
                t = t.set_column(idx, t.schema.field(col), shifted)
            replicas.append(t)
        big = pa.concat_tables(replicas)
        pq.write_table(
            big, os.path.join(out_dir, f"{name}.parquet"), row_group_size=1 << 20
        )
        print(f"{name}: {src.num_rows} -> {big.num_rows} rows")
    print(f"done -> {out_dir} (k={k})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
