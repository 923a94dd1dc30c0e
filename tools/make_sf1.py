#!/usr/bin/env python3
"""Synthesize an sf1-scale benchmark dataset (10x sf0.1) for the
scale-ratio bench (BENCH_SF1.json).

Each table is the union of 10 key-shifted replicas of the sf0.1
parquet, written with pyarrow so every physical type matches the
driver's layout byte-for-byte (the schema canary's concern). Key
columns shift by replica*OFFSET so referential integrity holds WITHIN
a replica (lineitem_i joins orders_i/part_i/supplier_i, events_i keeps
its own users), and the static dims (region, nation) stay shared.
Nation/region keys are NOT shifted, so group-by-nation cardinalities
stay fixed while fact cardinality grows 10x -- the shape a real
scale-up has.

Text and embedding payloads are replicated as-is: cross-replica
near-duplicates are intentional (a 10x crawl IS duplicate-heavy), and
they stress exactly the bucket caps / cluster bounds the dedup
operators claim protect them.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [replicas]

replicas defaults to 10 (sf1). replicas=30 builds the ~sf3 dataset for
the 30x sweep; all shifted keys are int64, so offsets stay exact far
past any replica count this will ever see.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFFSET = 100_000_000  # far above any sf0.1 key

# key columns to shift, per table (referential groups share a shift)
SHIFTS = {
    "customer.parquet": ["c_custkey"],
    "supplier.parquet": ["s_suppkey"],
    "part.parquet": ["p_partkey"],
    "orders.parquet": ["o_orderkey", "o_custkey"],
    "lineitem.parquet": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events.parquet": ["event_id", "user_id"],
    "documents.parquet": ["doc_id"],
    "embeddings.parquet": ["vec_id"],
    # shared dims: one copy, no shift
    "region.parquet": None,
    "nation.parquet": None,
}


def main():
    os.makedirs(DST, exist_ok=True)
    for fname, keys in SHIFTS.items():
        t = pq.read_table(os.path.join(SRC, fname))
        if keys is None:
            out = t
        else:
            parts = []
            for i in range(REPLICAS):
                cols = []
                for name in t.schema.names:
                    c = t.column(name)
                    if i > 0 and name in keys:
                        c = pc.add(c, pa.scalar(i * OFFSET, type=c.type))
                    cols.append(c)
                parts.append(pa.table(cols, schema=t.schema))
            out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(DST, fname))
        print(f"{fname}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
