"""Cross-micro-batch near-duplicate detection: incremental MinHash-LSH.

Batch near-dup dedup (operators/dedup.py:minhash_lsh_pairs) answers "which
pairs in THIS corpus are near-dups"; a streaming ingest pipeline needs the
other question: "is this NEW document a near-dup of anything seen BEFORE"
— across micro-batch boundaries, without rescanning history. This module
keeps the LSH index incremental: per (band, band-key) state stores the
first document that ever hashed there; later arrivals in the same bucket
are emitted as near-dup candidates against that representative.

Semantics match the batch operator's candidate generation exactly — the
signature/banding formulas are THE SAME md5-derived arithmetic
(operators/dedup.py:161-190), re-expressed in Python for the Arrow path,
and pinned against the JVM implementation by
tests/test_stream_dedup.py::test_python_signature_matches_jvm. A doc is
flagged iff it shares >=1 band key with an earlier doc — precisely the
pairs the batch band self-join would produce, restricted to
(earlier, later). Like the batch operator, banding only PRUNES: callers
wanting threshold-exact pairs verify candidates with exact Jaccard
downstream (candidates are a tiny fraction of the stream).

100 TB posture: state is one long per DISTINCT band key (bounded by
bands x corpus-distinct signatures, not by stream length), partitioned by
band key in the state store — the same uniform md5-derived shuffle key the
batch join uses. No rescans, no growth with re-ingested duplicates.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from go_pq_cdc_kafka_spark.operators.dedup import _MH_MOD, _H30, _mh_consts

# Python twins of the JVM/duckdb-shared text machinery
# (functions/text.py:26,44-71 — ASCII lowercase, explicit whitespace class)
_WS_RE = re.compile(r"[ \t\n\r\f\x0B]+")
_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _py_tokens(text: str) -> list[str]:
    return [t for t in _WS_RE.split(text.translate(_LOWER)) if t != ""]


def _py_shingles(text: str, n: int = 3) -> list[str]:
    """Distinct word n-grams; mirrors functions/text.py:268-275 including
    the short-doc rule (docs with < n tokens yield their full token join,
    and an empty doc yields the '' shingle)."""
    toks = _py_tokens(text)
    hi = max(len(toks) - (n - 1), 1)
    out, seen = [], set()
    for i in range(hi):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _py_hash64(s: str) -> int:
    """functions/text.py:189-192: first 15 md5 hex chars as a 60-bit int."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_signature(text: str, num_perms: int = 16, n: int = 3) -> list[int]:
    """operators/dedup.py:161-190: h30 = hash64 % 2^30 per shingle, then
    mh_p = min((A_p * h30 + B_p) mod M) over the doc's shingles."""
    h30s = [_py_hash64(s) % _H30 for s in _py_shingles(text, n)]
    consts = [_mh_consts(p) for p in range(num_perms)]
    return [min((a * h + b) % _MH_MOD for h in h30s) for a, b in consts]


def band_keys_stream(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """(doc_id, band_id, band_key) — one row per band per document, via an
    Arrow-batched mapInPandas (the per-doc signature is a tight Python
    loop over the doc's own shingles; no JVM<->Python chatter per token).
    band_key format matches the batch operator's concat_ws('|', ...)."""
    r = num_perms // bands

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bids, keys = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sig = _py_signature(text or "", num_perms, n)
                for b in range(bands):
                    ids.append(doc_id)
                    bids.append(b)
                    keys.append(
                        "|".join(str(sig[b * r + i]) for i in range(r))
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "band_id": bids, "band_key": keys}
            )

    return df.mapInPandas(gen, schema="doc_id long, band_id int, band_key string")


_OUT_SCHEMA = "doc_id long, dup_of long, band_id int"
_STATE_SCHEMA = "first_id long"


def _dedup_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    first_id = state.get[0] if state.exists else None
    out_doc, out_rep = [], []
    docs: list[int] = []
    for pdf in pdfs:
        docs.extend(int(d) for d in pdf["doc_id"])
    # deterministic within a batch: the smallest id in a fresh bucket is
    # the representative (matches the batch operator's doc_a < doc_b
    # orientation); replays of the representative itself are no-ops
    for d in sorted(set(docs)):
        if first_id is None:
            first_id = d
        elif d != first_id:
            out_doc.append(d)
            out_rep.append(first_id)
    state.update((first_id,))
    if out_doc:
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "dup_of": out_rep,
                "band_id": [key[0]] * len(out_doc),
            }
        )


def streaming_minhash_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Streaming near-dup candidates: (doc_id, dup_of, band_id) for every
    document that lands in a band bucket some earlier document already
    claimed — including across micro-batch boundaries (the case batch
    dedup cannot see without rescanning all of history). Downstream:
    ``.groupBy("doc_id").agg(F.min("dup_of"))`` for one verdict per doc,
    then exact-Jaccard verification of the surviving pairs if
    threshold-exact semantics are required."""
    return band_keys_stream(
        stream, text_col, id_col, num_perms, bands, n
    ).groupBy("band_id", "band_key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
