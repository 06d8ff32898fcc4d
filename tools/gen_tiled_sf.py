"""Deterministic scale-up of a testdata sf directory by integer tiling.

Replica k (k = 0..factor-1) of each table gets every key column shifted by
k * (max_key + 1) so referential integrity holds within a replica and no
keys collide across replicas. Payload columns are transformed so replicas
do not create cross-replica duplicate structure:

- documents.text: per-replica Caesar rotation of [a-z] (k=0 is identity) —
  token boundaries, lengths, and n_chars are preserved, every shingle/token
  differs across replicas, so the planted duplicate-family structure of the
  source sf is replicated exactly once per replica (total edges = factor x
  source edges; no cross-replica near-dups).
- embeddings.embedding: cyclic rotation of the vector by k positions —
  norms are preserved; cross-replica cosine pairs are incoherent.
- events: user_id and event_id shifted; timestamps unchanged so hourly
  aggregations see factor x rows per bucket (the realistic growth mode).
- nation/region: copied as-is (fixed dimensions; tiled customers/suppliers
  keep their original nationkey).

This is NOT the driver's sf1.0 generator (that is driver-side and not in
the sandbox); it exists so before/after optimization ratios can be
measured at a scale where per-stage latency floors stop dominating, on a
dataset anyone can regenerate bit-identically from /root/testdata/sf0.1.

Usage: python tools/gen_tiled_sf.py --src /root/testdata/sf0.1 \
           --out /tmp/sf0.1x10 --factor 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_COLS = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}

# keep cross-table references consistent: the shift base for a key column
# is derived from the table that OWNS the key.
KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}

ROW_GROUP_ROWS = {
    "lineitem": 1_000_000,
    "events": 250_000,
    "documents": 5_000,
    "orders": 250_000,
}

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rot_text(col: pa.ChunkedArray, k: int) -> pa.ChunkedArray:
    if k == 0:
        return col
    table = str.maketrans(ALPHA, ALPHA[k % 26:] + ALPHA[: k % 26])
    return pa.chunked_array(
        [pa.array([s.translate(table) if s is not None else None
                   for s in chunk.to_pylist()], type=pa.string())
         for chunk in col.chunks]
    )


def _rot_vec(col: pa.ChunkedArray, k: int) -> pa.ChunkedArray:
    if k == 0:
        return col
    out = []
    for chunk in col.chunks:
        flat = chunk.flatten().to_numpy(zero_copy_only=False)
        offsets = chunk.offsets.to_numpy(zero_copy_only=False)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
        mat = flat.reshape(-1, dim)
        out.append(pa.array(list(np.roll(mat, k % dim, axis=1))),)
    return pa.chunked_array(
        [c.cast(col.type) for c in out]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    tables = {
        name: pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        for name in (
            "region nation customer supplier part orders "
            "lineitem events documents embeddings"
        ).split()
    }
    base = {
        (owner, col): int(pc.max(tables[owner][col]).as_py()) + 1
        for owner, col in set(KEY_OWNER.values())
    }

    for name, tbl in tables.items():
        dst = os.path.join(args.out, f"{name}.parquet")
        if name not in KEY_COLS:  # region, nation: fixed dimensions
            pq.write_table(tbl, dst)
            print(f"{name}: copied {tbl.num_rows} rows")
            continue
        replicas = []
        for k in range(args.factor):
            rep = tbl
            for col in KEY_COLS[name]:
                shift = k * base[KEY_OWNER[col]]
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(rep[col], shift).cast(rep.schema.field(col).type)
                rep = rep.set_column(idx, rep.schema.field(col), shifted)
            if name == "documents":
                idx = rep.schema.get_field_index("text")
                rep = rep.set_column(
                    idx, rep.schema.field("text"), _rot_text(rep["text"], k)
                )
            if name == "embeddings":
                idx = rep.schema.get_field_index("embedding")
                rep = rep.set_column(
                    idx, rep.schema.field("embedding"),
                    _rot_vec(rep["embedding"], k),
                )
            replicas.append(rep)
        out = pa.concat_tables(replicas)
        pq.write_table(out, dst, row_group_size=ROW_GROUP_ROWS.get(name, 10**9))
        print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
