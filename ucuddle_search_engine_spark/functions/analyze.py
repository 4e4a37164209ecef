"""The analyzer chain — ONE tokenizer shared by index build and query side.

The reference configures this inside Elasticsearch: standard tokenizer +
lowercase (+ language stop/stem) at crawler/functs_with_elastic.go:136-157, and
pins search_analyzer == index analyzer (crawler/functs_with_elastic.go:85-94) so
query terms hit the same token space. We enforce the same parity by exposing a
single token regex in three strictly-equivalent forms:

1. ``tokenize_col`` — Column expression (JVM regexp_extract_all, codegen'd):
   the hot path for stats and the exact-BM25 oracle queries.
2. ``tokenize_with_positions_udf`` — Arrow-batched pandas UDF returning
   array<struct<term,pos>>: the index-build path (positions feed highlight C7
   and phrase queries; ES retains them for `text` fields).
3. ``analyze_query`` — plain-Python for the driver-side query string (the
   reference analyzes the query with the same analyzer, web/app.py:26-35).

The token alphabet is ASCII [a-z0-9]+ over lowercased text — deliberate: it is
expressible identically in Java regex (Spark), Python re, and RE2 (DuckDB
oracle), which is what makes rank-identity machine-checkable. Stopword removal
is OFF by default (the code corpus has no natural-language stop list; the
reference's russian_stop applies to its web corpus only).
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import TOKENS_SCHEMA

TOKEN_PATTERN = "[a-z0-9]+"
_PY_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_col(col: Column | str) -> Column:
    """Array-of-terms Column: lowercase + regex extract. Whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def analyze_query(query: str) -> List[str]:
    """Driver-side analysis of a query string (order-preserving, with dups)."""
    return _PY_TOKEN_RE.findall(query.lower())


def _tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenize-with-positions over an Arrow batch."""
    out = []
    for text in texts:
        if text is None:
            out.append([])
            continue
        toks = _PY_TOKEN_RE.findall(text.lower())
        out.append([{"term": t, "pos": i} for i, t in enumerate(toks)])
    return pd.Series(out, index=texts.index)


@F.pandas_udf(TOKENS_SCHEMA)
def tokenize_with_positions_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Scalar-iterator pandas UDF: content -> array<struct<term,pos>>.

    Iterator form so per-batch overhead (none here, but e.g. a loaded stemmer)
    amortizes across Arrow batches within a partition.
    """
    for texts in it:
        yield _tokenize_series(texts)


from pyspark.sql import types as _T

TERMVECTOR_SCHEMA = _T.ArrayType(
    _T.StructType(
        [
            _T.StructField("term", _T.StringType(), False),
            _T.StructField("tf", _T.LongType(), False),
            _T.StructField("positions", _T.ArrayType(_T.IntegerType()), False),
            _T.StructField("doclen", _T.LongType(), False),
        ]
    )
)


@F.pandas_udf(TERMVECTOR_SCHEMA)
def termvector_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """content -> per-doc term vector [(term, tf, positions, doclen)] — the
    analysis stage pre-aggregated per document (what ES's analyzer emits).

    Doing the per-doc tf/position aggregation inside the Arrow batch removes
    the (term, doc_id) groupBy shuffle from the index build entirely (explode
    of this array is narrow), and carrying doclen removes the doc-stats join:
    the only wide exchange left in the whole build is the final repartition by
    (shard, term)."""
    for texts in it:
        out = []
        for text in texts:
            if text is None:
                out.append([])
                continue
            agg: dict[str, list[int]] = {}
            toks = _PY_TOKEN_RE.findall(text.lower())
            for i, t in enumerate(toks):
                agg.setdefault(t, []).append(i)
            n = len(toks)
            out.append([{"term": t, "tf": len(ps), "positions": ps, "doclen": n} for t, ps in agg.items()])
        yield pd.Series(out, index=texts.index)
