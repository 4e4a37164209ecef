"""The shuffle-free termvector postings path must produce exactly the rows of
the classic groupBy path (tf, positions, doclen) — the fast build's license to
exist is bit-identity with the oracle construction."""

from __future__ import annotations

import pytest

from ucuddle_search_engine_spark.operators.postings import (
    build_docs,
    build_postings,
    build_postings_fast,
    doc_stats,
    doclens_from_docs,
)
from ucuddle_search_engine_spark.synth import synth_corpus


@pytest.fixture(scope="module")
def docs(spark):
    corpus = synth_corpus(spark, 400, partitions=4)
    return build_docs(corpus, num_shards=3).persist()


def _rows(df):
    return sorted(
        (r["term"], r["doc_id"], r["field"], r["tf"], tuple(r["positions"]))
        for r in df.select("term", "doc_id", "field", "tf", "positions").collect()
    )


def test_fast_equals_classic(docs):
    classic = build_postings(docs)
    fast = build_postings_fast(docs)
    assert _rows(fast) == _rows(classic)


def test_fast_doclen_equals_docstats(docs):
    fast = build_postings_fast(docs)
    a = sorted(
        (r["doc_id"], r["field"], r["doclen"])
        for r in fast.select("doc_id", "field", "doclen").distinct().collect()
    )
    b = sorted(
        (r["doc_id"], r["field"], r["doclen"])
        for r in doc_stats(build_postings(docs)).collect()
    )
    c = sorted((r["doc_id"], r["field"], r["doclen"]) for r in doclens_from_docs(docs).collect())
    assert a == b == c
