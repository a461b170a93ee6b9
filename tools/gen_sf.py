#!/usr/bin/env python
"""Scale-step fixture generator: derive an sf-K× dataset from an existing
driver-generated sf directory by key-offset replication, preserving every
parquet schema byte-for-byte (pyarrow read → transform → write).

Why replication instead of re-synthesis: the driver's generator is not in
the repo, and what the scale step must preserve is the SHAPE the engine
plans against — schemas, key relationships (orders↔lineitem↔part/supplier,
customer↔nation), value distributions per replica, selectivity of the
bench predicates. Each replica shifts every entity key by
``replica * key_base`` so referential integrity holds within and across
replicas and join fan-outs stay constant per key.

Text and embedding payloads are PERTURBED per replica, not copied: a
10×-duplicated corpus would give every document 9 exact twins and blow the
near-dup pair count (and any LSH self-join bench) up ~100× — the opposite
of how a real 10× corpus behaves. Documents get a replica-salted token
woven between words (kills shingle overlap; replicas are NOT near-dups of
each other), embeddings get a deterministic element rotation (changes
neighborhoods, keeps norms/distribution).

Usage: python tools/gen_sf.py [--mult 10] [--src /root/testdata/sf0.1]
       [--out /tmp/spark_graft_sf1]

Deterministic: replica transforms are pure functions of (replica, row) —
no RNG, no timestamps.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# fixed dimensions copied verbatim; everything else replicates with offsets
COPY_TABLES = ("region", "nation")


def _key_base(col: pa.ChunkedArray) -> int:
    """Offset unit: a round power of ten above max(key) so replica keys are
    visually distinguishable and can never collide."""
    mx = int(pa.compute.max(col).as_py() or 0)
    base = 1
    while base <= mx:
        base *= 10
    return base


def _offset(tbl: pa.Table, name: str, delta: int) -> pa.Table:
    i = tbl.schema.get_field_index(name)
    col = pa.compute.add(tbl.column(i), delta)
    return tbl.set_column(i, tbl.schema.field(i), col.cast(tbl.schema.field(i).type))


def _salt_texts(texts: list[str], replica: int) -> list[str]:
    """Weave a replica-salted token after every 3rd word: shingle overlap
    with the source replica drops below any near-dup threshold while
    length/vocabulary distributions stay comparable."""
    out = []
    for j, t in enumerate(texts):
        words = t.split(" ")
        salt = f"q{replica}z{j % 97}"
        woven = []
        for k, w in enumerate(words):
            woven.append(w)
            if k % 3 == 2:
                woven.append(f"{salt}{k % 7}")
        out.append(" ".join(woven))
    return out


def generate(src: str, out: str, mult: int) -> None:
    os.makedirs(out, exist_ok=True)

    for t in COPY_TABLES:
        pq.write_table(pq.read_table(os.path.join(src, f"{t}.parquet")),
                       os.path.join(out, f"{t}.parquet"))

    tables = {
        n: pq.read_table(os.path.join(src, f"{n}.parquet"))
        for n in ("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings")
    }
    bases = {
        "cust": _key_base(tables["customer"].column("c_custkey")),
        "supp": _key_base(tables["supplier"].column("s_suppkey")),
        "part": _key_base(tables["part"].column("p_partkey")),
        "order": _key_base(tables["orders"].column("o_orderkey")),
        "event": _key_base(tables["events"].column("event_id")),
        "user": _key_base(tables["events"].column("user_id")),
        "doc": _key_base(tables["documents"].column("doc_id")),
        "vec": _key_base(tables["embeddings"].column("vec_id")),
    }

    def replicas(name: str, fn):
        # stream one replica at a time: peak memory stays ~1 source table
        # regardless of mult (mult=100 for sf10 would otherwise hold the
        # whole 60M-row lineitem in RAM before the write)
        path = os.path.join(out, f"{name}.parquet")
        writer = None
        n = 0
        try:
            for i in range(mult):
                part = fn(tables[name], i).combine_chunks()
                if writer is None:
                    writer = pq.ParquetWriter(path, part.schema)
                writer.write_table(part)
                n += part.num_rows
        finally:
            if writer is not None:
                writer.close()
        return n

    n = replicas("customer", lambda t, i: _offset(t, "c_custkey", i * bases["cust"]))
    print(f"customer: {n}")
    n = replicas("supplier", lambda t, i: _offset(t, "s_suppkey", i * bases["supp"]))
    print(f"supplier: {n}")
    n = replicas("part", lambda t, i: _offset(t, "p_partkey", i * bases["part"]))
    print(f"part: {n}")

    def orders_rep(t, i):
        t = _offset(t, "o_orderkey", i * bases["order"])
        return _offset(t, "o_custkey", i * bases["cust"])

    n = replicas("orders", orders_rep)
    print(f"orders: {n}")

    def lineitem_rep(t, i):
        t = _offset(t, "l_orderkey", i * bases["order"])
        t = _offset(t, "l_partkey", i * bases["part"])
        return _offset(t, "l_suppkey", i * bases["supp"])

    n = replicas("lineitem", lineitem_rep)
    print(f"lineitem: {n}")

    def events_rep(t, i):
        t = _offset(t, "event_id", i * bases["event"])
        return _offset(t, "user_id", i * bases["user"])

    n = replicas("events", events_rep)
    print(f"events: {n}")

    def documents_rep(t, i):
        t = _offset(t, "doc_id", i * bases["doc"])
        if i == 0:
            return t
        texts = t.column("text").to_pylist()
        salted = _salt_texts(texts, i)
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, t.schema.field(ti), pa.array(salted, pa.string()))
        ni = t.schema.get_field_index("n_chars")
        lens = pa.array([len(s) for s in salted], t.schema.field(ni).type)
        return t.set_column(ni, t.schema.field(ni), lens)

    n = replicas("documents", documents_rep)
    print(f"documents: {n}")

    def embeddings_rep(t, i):
        t = _offset(t, "vec_id", i * bases["vec"])
        if i == 0:
            return t
        emb = t.column("embedding").combine_chunks()
        arrs = emb.to_pylist()
        dim = len(arrs[0]) if arrs else 0
        # roll wraps at dim, so replicas i and i+dim would be EXACT
        # duplicates past mult=dim (sf10 = 100 replicas > dim 64): add a
        # norm-preserving per-replica sign-flip mask (deterministic integer
        # hash of (replica, element), no RNG) so every replica's
        # neighborhood is distinct while norms/distributions are unchanged.
        m = (i * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        m ^= m >> 29  # avalanche so low bits differ per replica too
        flips = np.where(
            [(m >> (k % 64)) & 1 for k in range(dim)], -1.0, 1.0
        ).astype(np.float32)
        rolled = [
            (np.roll(np.asarray(a, dtype=np.float32), i % max(dim, 1)) * flips)
            .tolist()
            for a in arrs
        ]
        ei = t.schema.get_field_index("embedding")
        return t.set_column(
            ei, t.schema.field(ei), pa.array(rolled, t.schema.field(ei).type)
        )

    n = replicas("embeddings", embeddings_rep)
    print(f"embeddings: {n}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    args = ap.parse_args()
    generate(args.src, args.out, args.mult)
    print(f"wrote {args.out} ({args.mult}x {args.src})")


if __name__ == "__main__":
    main()
