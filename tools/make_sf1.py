"""Stage a 10× scale rehearsal corpus (.scratch/sf1) from sf0.1.

VERDICT r6 item 5: the 100-TB arguments are plan-shape arguments; a
one-off sf1 sweep turns them into measured sf0.1→sf1 scaling curves
(SCALE.md).  The driver only ships sf ≤ 0.1, so sf1 is synthesized by
REPLICATING sf0.1 ten times with consistent key shifts:

- fact/entity surrogate keys (event_id, doc_id, vec_id, o_orderkey,
  l_orderkey, c_custkey, p_partkey, s_suppkey) shift by
  copy × max_key_space so ids stay unique AND referential integrity
  (orders⋈customer, lineitem⋈orders/part/supplier) is preserved —
  each copy is a self-contained tenant, the classic scale-out shape;
- nation/region stay 1× (true dimensions);
- timestamps, text, vectors, and measures are left as-is: the time
  range keeps its span at 10× density, users get 10× the events, and
  the document corpus gains exact-duplicate groups (a brutal-but-fair
  stress for the dedup family's bucket math).

Usage:  python tools/make_sf1.py   # writes .scratch/sf1/<table>.parquet
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DEST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
COPIES = 10

#: table -> columns shifted by copy_index * stride[col].  Strides are
#: closed key spaces (> max key in sf0.1) shared across tables so
#: foreign keys stay aligned per copy.
STRIDES = {
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "c_custkey": 1_000_000,
    "o_custkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_partkey": 1_000_000,
    "s_suppkey": 100_000,
    "l_suppkey": 100_000,
    "event_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

REPLICATED = (
    "customer supplier part orders lineitem events documents embeddings".split()
)
DIMENSIONS = "region nation".split()


def main() -> None:
    os.makedirs(DEST, exist_ok=True)
    for t in DIMENSIONS:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tbl, f"{DEST}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows (1x dimension)")
    for t in REPLICATED:
        base = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for k in range(COPIES):
            cols = []
            for name in base.column_names:
                col = base[name]
                if name in STRIDES and k > 0:
                    col = pc.add(col, pa.scalar(k * STRIDES[name], type=pa.int64()))
                    col = col.cast(base.schema.field(name).type)
                cols.append(col)
            copies.append(pa.Table.from_arrays(cols, schema=base.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{DEST}/{t}.parquet", row_group_size=256 * 1024)
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")
    print("staged", DEST)


if __name__ == "__main__":
    sys.exit(main())
