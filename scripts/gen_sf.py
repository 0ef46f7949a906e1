#!/usr/bin/env python3
"""Generate a larger scale factor from an existing testdata directory by
deterministic replicate-with-shift (default: 10 copies of sf0.1 -> sf1).

/root/testdata is read-only and the driver's generator is not available,
so scale-up data is derived from the largest existing sf. Each copy k
shifts every key column by k * <table row count>, so FK relationships
(orders->customer, lineitem->orders/part/supplier) hold within and across
copies and the key space stays contiguous. The tiny dims (region, nation)
are not replicated.

Cross-copy collision structure is deliberately broken so pair-generating
operators scale linearly (each copy contributes the original corpus's
planted structure, shifted):
- documents: for copy k >= 1 every alphanumeric token gets a k suffix.
  Within-copy shingle/window equality (minhash, simhash, n-gram, span
  dedup) is preserved exactly; no gram ever matches across copies.
  n_chars is recomputed to stay consistent with the transformed text.
- embeddings: copy k >= 1 applies a seeded signed permutation (Rademacher
  signs o dimension permutation) - an orthogonal transform, so within-copy
  inner products and norms are bit-preserved (sign flip and permutation
  are exact in float32), while cross-copy cosines are ~N(0, 1/64): no
  spurious near-dup cliques between copies.

Usage: python3 scripts/gen_sf.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10. Deterministic (seed 1337).
"""
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SEED = 1337

# table -> key columns shifted by k * <row count of the keyed table>
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def shift_col(tbl, col, amount):
    i = tbl.schema.get_field_index(col)
    shifted = pc.add(tbl[col], pa.scalar(amount, type=tbl.schema.field(col).type))
    return tbl.set_column(i, tbl.schema.field(col), shifted)


def replace_col(tbl, col, array):
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, tbl.schema.field(col), array.cast(tbl.schema.field(col).type))


def main():
    os.makedirs(DST, exist_ok=True)
    tables = {}
    for f in sorted(os.listdir(SRC)):
        if f.endswith(".parquet"):
            tables[f[:-8]] = pq.read_table(os.path.join(SRC, f))

    sizes = {name: t.num_rows for name, t in tables.items()}
    # user_id has its own (smaller) key space inside events
    sizes["events_users"] = int(pc.max(tables["events"]["user_id"]).as_py()) + 1

    for name, tbl in tables.items():
        if name not in SHIFTS:  # region, nation: fixed dims
            pq.write_table(tbl, os.path.join(DST, name + ".parquet"))
            print(f"{name}: {tbl.num_rows} rows (not replicated)")
            continue
        copies = []
        for k in range(COPIES):
            c = tbl
            for col, space in SHIFTS[name].items():
                c = shift_col(c, col, k * sizes[space])
            if k > 0 and name == "documents":
                texts = [re.sub(r"[A-Za-z0-9]+", lambda m, s=str(k): m.group(0) + s, t)
                         for t in c["text"].to_pylist()]
                c = replace_col(c, "text", pa.array(texts))
                c = replace_col(c, "n_chars", pa.array([len(t) for t in texts]))
            if k > 0 and name == "embeddings":
                emb = np.array(c["embedding"].to_pylist(), dtype=np.float32)
                rng = np.random.default_rng(SEED + k)
                perm = rng.permutation(emb.shape[1])
                signs = rng.choice(np.float32([-1.0, 1.0]), size=emb.shape[1])
                emb = emb[:, perm] * signs  # exact in float32
                c = replace_col(
                    c, "embedding",
                    pa.array(list(emb), type=pa.list_(pa.float32())))
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(DST, name + ".parquet"))
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
