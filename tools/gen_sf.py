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

``--skew`` produces the Zipfian variant real 100 TB corpora have and
uniform replication hides: a fixed set of HOT keys (8 per dimension,
always replica-0 keys so referential integrity holds) absorbs ~20 % of
all fact rows across every replica — hot orders/parts/suppliers in
lineitem, hot customers in orders, hot users in events — and ~20 % of
documents get a Zipf-hot token block woven in (a tiny shared vocabulary
whose shingles reach extreme document frequency, stressing the inverted-
index paths and the max_df valve). Row selection and hot-key choice are
deterministic integer hashes of the global row position — no RNG.
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


HOT_FRACTION = 0.2  # share of fact rows redirected to hot keys
N_HOT = 8           # hot keys per dimension


def _row_hash(n: int, offset: int) -> np.ndarray:
    """Deterministic per-row 64-bit mix of the GLOBAL row index (source
    rows × replica offset) — splitmix64's finalizer, no RNG state."""
    idx = np.arange(offset, offset + n, dtype=np.uint64)
    z = idx + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _skew_keys(tbl: pa.Table, col: str, hot: np.ndarray, offset: int) -> pa.Table:
    """Redirect ~HOT_FRACTION of rows' ``col`` to one of the ``hot`` keys
    (chosen by row hash), leaving the rest untouched."""
    i = tbl.schema.get_field_index(col)
    vals = np.asarray(tbl.column(i).combine_chunks().to_numpy(zero_copy_only=False))
    h = _row_hash(len(vals), offset)
    is_hot = (h % np.uint64(1000)) < np.uint64(int(HOT_FRACTION * 1000))
    out = np.where(is_hot, hot[(h >> np.uint64(17)) % np.uint64(len(hot))], vals)
    arr = pa.array(out).cast(tbl.schema.field(i).type)
    return tbl.set_column(i, tbl.schema.field(i), arr)


def _zipf_hot_texts(texts: list[str], offset: int) -> list[str]:
    """Weave a Zipf-hot token block into ~HOT_FRACTION of documents: a
    shared 8-token vocabulary repeated with harmonic weights, so a few
    shingles reach extreme document frequency (the head of a Zipf token
    law) while the rest of the text keeps its replica-salted diversity."""
    h = _row_hash(len(texts), offset)
    is_hot = (h % np.uint64(1000)) < np.uint64(int(HOT_FRACTION * 1000))
    out = []
    for j, t in enumerate(texts):
        if not is_hot[j]:
            out.append(t)
            continue
        k = int((h[j] >> np.uint64(23)) % np.uint64(N_HOT))
        # harmonic repeats: token 0 everywhere, token k with rank weight
        block = " ".join(
            f"zipfhot{r}" for r in range(N_HOT) for _ in range(N_HOT // (r + 1))
            if r <= k
        )
        words = t.split(" ")
        mid = len(words) // 2
        out.append(" ".join(words[:mid] + [block] + words[mid:]))
    return out


def generate(src: str, out: str, mult: int, skew: bool = False) -> None:
    os.makedirs(out, exist_ok=True)

    for t in COPY_TABLES:
        pq.write_table(pq.read_table(os.path.join(src, f"{t}.parquet")),
                       os.path.join(out, f"{t}.parquet"))

    tables = {
        n: pq.read_table(os.path.join(src, f"{n}.parquet"))
        for n in ("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings")
    }
    def _hot(table: str, col: str) -> np.ndarray:
        """N_HOT evenly spaced replica-0 keys (always present in every
        skewed fixture; spacing avoids clustering in one scan range)."""
        keys = np.unique(
            np.asarray(
                tables[table]
                .column(col)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
        )
        return keys[np.linspace(0, len(keys) - 1, N_HOT, dtype=np.int64)]

    if skew:
        hots = {
            "order": _hot("orders", "o_orderkey"),
            "part": _hot("part", "p_partkey"),
            "supp": _hot("supplier", "s_suppkey"),
            "cust": _hot("customer", "c_custkey"),
            "user": _hot("events", "user_id"),
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
        t = _offset(t, "o_custkey", i * bases["cust"])
        if skew:
            t = _skew_keys(t, "o_custkey", hots["cust"], i * t.num_rows)
        return t

    n = replicas("orders", orders_rep)
    print(f"orders: {n}")

    def lineitem_rep(t, i):
        t = _offset(t, "l_orderkey", i * bases["order"])
        t = _offset(t, "l_partkey", i * bases["part"])
        t = _offset(t, "l_suppkey", i * bases["supp"])
        if skew:
            off = i * t.num_rows
            t = _skew_keys(t, "l_orderkey", hots["order"], off)
            t = _skew_keys(t, "l_partkey", hots["part"], off + 1)
            t = _skew_keys(t, "l_suppkey", hots["supp"], off + 2)
        return t

    n = replicas("lineitem", lineitem_rep)
    print(f"lineitem: {n}")

    def events_rep(t, i):
        t = _offset(t, "event_id", i * bases["event"])
        t = _offset(t, "user_id", i * bases["user"])
        if skew:
            t = _skew_keys(t, "user_id", hots["user"], i * t.num_rows)
        return t

    n = replicas("events", events_rep)
    print(f"events: {n}")

    def documents_rep(t, i):
        t = _offset(t, "doc_id", i * bases["doc"])
        if i == 0 and not skew:
            return t
        texts = t.column("text").to_pylist()
        salted = _salt_texts(texts, i) if i > 0 else texts
        if skew:
            salted = _zipf_hot_texts(salted, i * t.num_rows)
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
    ap.add_argument(
        "--skew", action="store_true",
        help="Zipfian variant: 8 hot keys/dim absorb ~20%% of fact rows; "
        "~20%% of documents get Zipf-hot tokens",
    )
    args = ap.parse_args()
    generate(args.src, args.out, args.mult, skew=args.skew)
    print(
        f"wrote {args.out} ({args.mult}x {args.src}"
        f"{', skewed' if args.skew else ''})"
    )


if __name__ == "__main__":
    main()
