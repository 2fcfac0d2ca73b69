"""Generate a scaled timing dataset from /root/testdata/sf0.1.

The driver's round-end MEASUREMENT escalated to sf1.0 (BENCH_r05.json:
"sf_escalated_from": 0.1) but only sf{0.001,0.01,0.1} ship in the
sandbox, so optimization work needs its own at-scale copy. This tool
replicates sf0.1 K times with key offsets so cardinalities scale the
way the driver's generator scales them (users x10, docs x10,
embeddings x4 per decade — verified against sf0.01 vs sf0.1):

- star-schema tables: keys offset per copy, join fan-in preserved;
- documents: copy 0 verbatim; later copies get a deterministic
  per-copy word shuffle, which preserves token/char statistics (tf-idf,
  quality, token counts) while breaking cross-copy shingle identity so
  LSH/minhash candidate pair counts grow ~linearly like real data
  (verbatim copies would grow them quadratically);
- embeddings: per-copy dimension permutation — norms preserved,
  cross-copy cosine decorrelated.

Timing data ONLY: never used by the oracle gate or bench.py.

Usage: python tools/make_scale_data.py [out_dir] [copies] [emb_copies]
"""

from __future__ import annotations

import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _offset(tbl: pa.Table, col: str, stride: int, copy: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    typ = tbl.schema.field(i).type
    shifted = pc.add(tbl.column(col), pa.scalar(stride * copy, type=typ))
    return tbl.set_column(i, col, shifted)


def _stride(tbl: pa.Table, col: str) -> int:
    return int(pc.max(tbl.column(col)).as_py()) + 1


def scale_star(out: str, copies: int) -> None:
    plain = {"nation": None, "region": None}
    keyed = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
    }
    strides: dict[str, int] = {}
    base = {"o_orderkey": "orders", "l_orderkey": "orders",
            "o_custkey": "customer", "c_custkey": "customer",
            "l_partkey": "part", "p_partkey": "part",
            "l_suppkey": "supplier", "s_suppkey": "supplier",
            "event_id": "events", "user_id": "events"}
    tbls = {t: pq.read_table(f"{SRC}/{t}.parquet")
            for t in list(keyed) + list(plain)}
    strides["orders"] = _stride(tbls["orders"], "o_orderkey")
    strides["customer"] = _stride(tbls["customer"], "c_custkey")
    strides["part"] = _stride(tbls["part"], "p_partkey")
    strides["supplier"] = _stride(tbls["supplier"], "s_suppkey")
    strides["events"] = _stride(tbls["events"], "event_id")
    user_stride = _stride(tbls["events"], "user_id")

    for t in plain:
        pq.write_table(tbls[t], f"{out}/{t}.parquet")
        print("wrote", t, tbls[t].num_rows)
    for t, cols in keyed.items():
        parts = []
        for c in range(copies):
            tb = tbls[t]
            for col in cols:
                s = user_stride if col == "user_id" else strides[base[col]]
                tb = _offset(tb, col, s, c)
            parts.append(tb)
        full = pa.concat_tables(parts)
        pq.write_table(full, f"{out}/{t}.parquet")
        print("wrote", t, full.num_rows)


def scale_documents(out: str, copies: int) -> None:
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    stride = _stride(tbl, "doc_id")
    texts = tbl.column("text").to_pylist()
    parts = [tbl]
    for c in range(1, copies):
        rng = random.Random(c)
        shuffled = []
        for t in texts:
            words = (t or "").split(" ")
            rng.shuffle(words)
            shuffled.append(" ".join(words))
        tb = _offset(tbl, "doc_id", stride, c)
        ti = tb.schema.get_field_index("text")
        tb = tb.set_column(ti, "text", pa.array(shuffled, type=pa.string()))
        parts.append(tb)
    full = pa.concat_tables(parts)
    pq.write_table(full, f"{out}/documents.parquet")
    print("wrote documents", full.num_rows)


def scale_embeddings(out: str, copies: int) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    stride = _stride(tbl, "vec_id")
    vecs = np.array(tbl.column("embedding").to_pylist())
    dim = vecs.shape[1]
    parts = [tbl]
    for c in range(1, copies):
        perm = np.random.RandomState(c).permutation(dim)
        tb = _offset(tbl, "vec_id", stride, c)
        ei = tb.schema.get_field_index("embedding")
        permuted = pa.array(vecs[:, perm].tolist(),
                            type=tbl.schema.field(ei).type)
        tb = tb.set_column(ei, "embedding", permuted)
        parts.append(tb)
    full = pa.concat_tables(parts)
    pq.write_table(full, f"{out}/embeddings.parquet")
    print("wrote embeddings", full.num_rows)


def main() -> None:
    import os
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    emb_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(out, exist_ok=True)
    scale_star(out, copies)
    scale_documents(out, copies)
    scale_embeddings(out, emb_copies)


if __name__ == "__main__":
    main()
