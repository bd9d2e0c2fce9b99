#!/usr/bin/env python3
"""Build a local sf1 soak dataset (10x sf0.1) by FK-consistent replication.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB bar wants evidence
that the engine's scale-dependent constants (ndv band, decimal->double
hash routes, ANN training caps, dedup bucket caps) survive a 10x step.
This replicates sf0.1 ten times with key offsets that preserve every
foreign-key relationship, so the DuckDB oracle recomputes truth on the
same data and all catalog entries stay checkable:

  - dims region/nation are fixed-size (TPC-H semantics): copied once
  - customer/supplier/part/orders/lineitem/events replicate with key
    strides equal to each table's key cardinality; fact FKs move with
    their dimension copy (events.user_id rides the CUSTOMER stride)
  - documents replicate with doc_id offsets and IDENTICAL text: every
    doc gains 9 exact cross-copy duplicates, which is the realistic
    web-scale stress for the dedup family (dup rate grows with corpus)
  - embeddings perturb component 0 by +i*1e-3 per copy so cosine top-k
    stays tie-free for the recall-gated ANN entries

Schemas are preserved exactly via pyarrow (events.ts must stay
timestamp[ns] for the nanosAsLong load path).

Usage: python3 tools/make_sf1.py [src_dir dst_dir copies]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key-column strides per table = source key cardinality
STRIDES = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 15000},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}
FIXED = ["region", "nation"]


def replicate(name: str) -> None:
    src = pq.read_table(f"{SRC}/{name}.parquet")
    schema = pa.schema([src.schema.field(i) for i in range(len(src.schema))])
    strides = STRIDES[name]
    parts = []
    for i in range(COPIES):
        cols = []
        for field in schema:
            col = src.column(field.name)
            if field.name in strides and i > 0:
                col = pc.add(col, pa.scalar(i * strides[field.name], type=field.type))
            elif name == "embeddings" and field.name == "embedding" and i > 0:
                flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).copy()
                offsets = col.combine_chunks().offsets
                starts = offsets.to_numpy(zero_copy_only=False)[:-1]
                flat[starts] += i * 1e-3  # nudge component 0 per copy
                col = pa.ListArray.from_arrays(offsets, pa.array(flat, type=pa.float32()))
            cols.append(col)
        parts.append(pa.table(cols, schema=schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {src.num_rows} -> {out.num_rows}")


def main() -> None:
    import os

    os.makedirs(DST, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} (fixed dim, copied once)")
    for name in STRIDES:
        replicate(name)


if __name__ == "__main__":
    main()
