"""The user-defined-function surface (SURVEY §2.B UDF/UDAF/UDTF row).

The reference's single extension point is the ``Handler`` callback
(handler.go:5) — arbitrary per-event Go. Spark splits that surface by shape,
fastest first; this module demonstrates each tier the rest of the package
doesn't already cover (handler.py and functions.multimodal own ``mapInPandas``,
streaming.windows owns ``applyInPandasWithState``):

- :class:`ChunkWordsUDTF` — Spark 4 Python UDTF, the 1→N generator shape
  (document → context-window-sized chunks, the training-data chunking step).
  Used via ``LATERAL`` join so chunking streams row-by-row with no
  collect/explode of intermediate arrays.
- :func:`char_entropy` — scalar Arrow-batched ``pandas_udf``: per-row Python
  that vectorizes poorly as Column algebra (byte histogram → Shannon
  entropy), batched through Arrow so the Python boundary is crossed per
  ~10k-row batch, not per row.
- :func:`zscore_per_group` — batch ``applyInPandas`` (grouped-map): whole
  group in one pandas frame, the escape hatch for group-local algorithms.
  The same result is expressible with window functions (the test asserts
  exactly that); real uses are algorithms that are NOT — per-group model
  fits, sklearn scoring, etc.

Scale notes: a UDTF/pandas UDF runs inside the task, so all three distribute
with the data — but they are opaque to Catalyst (no pushdown through them,
no codegen inside). Keep them OUT of filters/joins hot paths; here they sit
terminal in the plan, after all relational pruning.
"""

from __future__ import annotations

import math
import re
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf, udtf

#: tokens-per-chunk for the chunking UDTF (context-window-ish unit).
CHUNK_TOKENS = 20

#: must match functions.text.WS_CLASS (Python re / java.util.regex / RE2 all
#: parse this literal class identically).
_WS_RE = re.compile(r"[ \t\n\r\f\x0B]+")


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkWordsUDTF:
    """Split a document into CHUNK_TOKENS-word chunks — one output row per
    chunk. Register with ``spark.udtf.register("chunk_words", ChunkWordsUDTF)``
    and invoke as ``... FROM docs d, LATERAL chunk_words(d.text) c``."""

    def eval(self, text: str | None) -> Iterator[tuple[int, str, int]]:
        if text is None:
            return
        toks = [t for t in _WS_RE.split(text) if t]
        for i in range(0, (len(toks) + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
            part = toks[i * CHUNK_TOKENS : (i + 1) * CHUNK_TOKENS]
            yield i, " ".join(part), len(part)


def chunk_words_sql(chunk_tokens: int = CHUNK_TOKENS) -> str:
    """DuckDB twin of the UDTF lateral (1-based end-inclusive list slices)."""
    n = chunk_tokens
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\r\f\x0B]+'), t -> t != '') AS ts
  FROM documents
),
chunks AS (
  SELECT doc_id, unnest([{{'i': i, 'c': array_to_string(ts[(i*{n})+1:(i*{n})+{n}], ' '),
                          'n': len(ts[(i*{n})+1:(i*{n})+{n}])}}
                         for i in generate_series(0, CAST(ceil(len(ts)/{n}.0) AS BIGINT) - 1)]) AS u
  FROM toks
)
SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx, u.c AS chunk, CAST(u.n AS INTEGER) AS n_tokens
FROM chunks ORDER BY doc_id, chunk_idx
"""


def char_entropy(col) -> F.Column:
    """Shannon entropy (bits) of the character distribution — a quality
    signal for filtering binary junk / repetitive spam out of a corpus.
    The pandas_udf is built lazily: decorating at import time would parse
    the return type, which needs an active SparkSession."""

    @pandas_udf("double")
    def _entropy(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> float | None:
            if t is None:
                return None
            if not t:
                return 0.0
            counts: dict[str, int] = {}
            for ch in t:
                counts[ch] = counts.get(ch, 0) + 1
            n = len(t)
            return -sum((c / n) * math.log2(c / n) for c in counts.values())

        return texts.map(one)

    return _entropy(col)


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Grouped-map ``applyInPandas``: standardize ``value_col`` within each
    group. Stands in for group-local algorithms with no Column-algebra form;
    for THIS formula prefer the window-function equivalent (stays in codegen,
    no Python) — the test pins both to the same result."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # NOT df.schema.add(...): StructType.add mutates in place, corrupting the
    # input DataFrame's cached schema (df.columns would grow the output col).
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)
        pdf[out_col] = (v - v.mean()) / sd if sd and sd > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(standardize, schema=schema)


def sum_squares_udaf(col) -> F.Column:
    """GROUPED_AGG ``pandas_udf`` (the UDAF tier: whole-group Series →
    one scalar, usable inside groupBy().agg alongside built-ins). The
    demonstration aggregate is integer Σx² so the result is EXACTLY
    reproducible by plain SQL (``SUM(x*x)``) — the UDAF machinery, not
    the arithmetic, is what this surface exercises. Spark runs it with
    map-side partial application per Arrow batch; for genuinely
    non-distributive aggregates prefer applyInPandas (grouped map).
    Built lazily like :func:`char_entropy` (return-type parsing needs an
    active session)."""

    @pandas_udf("long")
    def _sum_sq(values: pd.Series) -> int:
        v = values.astype("int64")
        return int((v * v).sum())

    return _sum_sq(col)


def count_udaf(col) -> F.Column:
    """Companion GROUPED_AGG count — Spark forbids mixing GROUPED_AGG
    pandas UDFs with non-pandas aggregates in a single ``agg`` call
    (INVALID_PANDAS_UDF_PLACEMENT), so UDAF-tier queries that also want a
    row count express it as a second pandas aggregate."""

    @pandas_udf("long")
    def _count(values: pd.Series) -> int:
        return int(values.notna().sum())

    return _count(col)
