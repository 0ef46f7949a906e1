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

Usage: python3 scripts/gen_sf.py [src_dir] [dst_dir] [copies] [--skew]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10. Deterministic (seed 1337).

--skew (SKEWCHECK mode): after replication, superimpose the hot-key
structure a real 100 TB corpus has and uniform replication lacks —
the round-11 gap: the cap/salt guards had only ever seen uniform or
hand-engineered inputs, never a full skewed gate.
- Zipf-redirected foreign keys: a fraction of orders.o_custkey,
  lineitem.l_partkey/l_suppkey and events.user_id rows are re-pointed at
  a small hot set drawn with Zipf(alpha=1.1) weights, so the top key
  carries a double-digit percent of the fact table. Redirect targets are
  EXISTING keys, so FK validity and every oracle's semantics hold — the
  gate checks Spark==DuckDB on whatever the data is.
- Hot boilerplate grams: a fraction of documents get the SAME sentence
  appended across all copies (deliberately breaking the per-copy token
  isolation), driving shared-gram document frequency into the cap region
  of the posting-bounded dedup operators. n_chars is kept consistent.
- Hot group-by domain: a fraction of documents.source collapses to
  "src0", skewing source-keyed aggregations.
"""
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ARGS = [a for a in sys.argv[1:] if a != "--skew"]
SKEW = "--skew" in sys.argv[1:]
SRC = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.1"
DST = ARGS[1] if len(ARGS) > 1 else "/tmp/sf1"
COPIES = int(ARGS[2]) if len(ARGS) > 2 else 10
SEED = 1337

# --skew parameters: (redirected fraction, hot-set size) per FK column,
# Zipf exponent for the within-hot-set weights, and the text knobs
SKEW_FRACS = {
    # orders is the salted-join stress: 0.8 puts ~31% of the fact table on
    # ONE customer (the hot-domain shape of a crawl corpus), and every
    # consumer of o_custkey is linear in it (dim join, group-by, window)
    ("orders", "o_custkey"): (0.8, 8, "customer", "c_custkey"),
    ("lineitem", "l_partkey"): (0.3, 8, "part", "p_partkey"),
    ("lineitem", "l_suppkey"): (0.3, 4, "supplier", "s_suppkey"),
    # events is softer than the FK dims on purpose: the engine's as-of /
    # funnel / session plans are linear in the hot key (union+window,
    # agg-to-agg), but their DUCKDB oracles materialize the per-key
    # purchase x click pair product — (0.5, 8) makes that 2.2e9 pairs
    # (1.6e9 on one key), which stalls the window-shaped oracles. (0.15,
    # 32) keeps the top user ~4000x the uniform mean (a real hot key for
    # Spark's plans) while bounding the oracle's pair product to ~1e8.
    ("events", "user_id"): (0.15, 32, None, None),
}
SKEW_ALPHA = 1.1
# 22 tokens: longer than the span-dedup window (16), so the sentence's
# interior 16-token windows are shared verbatim across every hot doc
HOT_SENTENCE = ("shared boilerplate footer all rights reserved contact "
                "support for terms and conditions of service please do "
                "not reply directly to this automated message")
HOT_TEXT_FRAC = 0.02   # fraction of documents carrying the hot sentence
HOT_SOURCE_FRAC = 0.3  # fraction of documents collapsed onto source src0

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


def zipf_redirect(out, col, frac, nhot, pool, rng):
    """Re-point `frac` of out[col] at `nhot` keys sampled from `pool`,
    weighted Zipf(SKEW_ALPHA) within the hot set. Returns (table, hot)."""
    n = out.num_rows
    vals = out[col].to_numpy(zero_copy_only=False).copy()
    hot = rng.choice(np.asarray(pool, dtype=np.int64),
                     size=min(nhot, len(pool)), replace=False)
    w = 1.0 / np.arange(1, len(hot) + 1) ** SKEW_ALPHA
    w /= w.sum()
    mask = rng.random(n) < frac
    vals[mask] = hot[rng.choice(len(hot), size=int(mask.sum()), p=w)]
    return replace_col(out, col, pa.array(vals)), hot


def apply_skew(outs):
    rng = np.random.default_rng(SEED + 7331)
    report = {}
    for (name, col), (frac, nhot, dim, dimkey) in SKEW_FRACS.items():
        pool = (outs[dim][dimkey] if dim is not None else outs[name][col])
        pool = pc.unique(pool).to_numpy(zero_copy_only=False)
        outs[name], hot = zipf_redirect(outs[name], col, frac, nhot, pool, rng)
        counts = pc.value_counts(outs[name][col])
        top = max(c["counts"] for c in counts.to_pylist())
        report[f"{name}.{col}"] = (
            f"top key {100.0 * top / outs[name].num_rows:.1f}% of rows "
            f"(hot set {len(hot)}, redirect {frac})")
    docs = outs["documents"]
    texts = docs["text"].to_pylist()
    hot_doc = rng.random(len(texts)) < HOT_TEXT_FRAC
    texts = [t + " " + HOT_SENTENCE if h else t
             for t, h in zip(texts, hot_doc)]
    docs = replace_col(docs, "text", pa.array(texts))
    docs = replace_col(docs, "n_chars", pa.array([len(t) for t in texts]))
    src = docs["source"].to_pylist()
    hot_src = rng.random(len(src)) < HOT_SOURCE_FRAC
    src = ["src0" if h else s for s, h in zip(src, hot_src)]
    docs = replace_col(docs, "source", pa.array(src))
    outs["documents"] = docs
    report["documents.text"] = (
        f"{int(hot_doc.sum())} docs ({100.0 * HOT_TEXT_FRAC:.0f}%) share the "
        f"{len(HOT_SENTENCE.split())}-token boilerplate sentence across copies")
    report["documents.source"] = (
        f"src0 now {100.0 * sum(1 for s in src if s == 'src0') / len(src):.1f}% of docs")
    for k, v in report.items():
        print(f"  skew {k}: {v}")


def main():
    os.makedirs(DST, exist_ok=True)
    tables = {}
    for f in sorted(os.listdir(SRC)):
        if f.endswith(".parquet"):
            tables[f[:-8]] = pq.read_table(os.path.join(SRC, f))

    sizes = {name: t.num_rows for name, t in tables.items()}
    # user_id has its own (smaller) key space inside events
    sizes["events_users"] = int(pc.max(tables["events"]["user_id"]).as_py()) + 1

    outs = {}
    for name, tbl in tables.items():
        if name not in SHIFTS:  # region, nation: fixed dims
            outs[name] = tbl
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
        outs[name] = out
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")

    if SKEW:
        apply_skew(outs)
    for name, out in outs.items():
        pq.write_table(out, os.path.join(DST, name + ".parquet"))


if __name__ == "__main__":
    main()
