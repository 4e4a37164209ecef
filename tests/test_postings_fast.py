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


def test_arrow_tokenizer_parity_no_spark():
    """The r7 vectorized tokenizer (utf8_lower + split_pattern_regex) must
    emit byte-identical batches to the per-doc regex path — including row
    ORDER (first-appearance term order within doc) — and must fall back to
    the regex path on any non-ASCII batch slice."""
    import re

    import pyarrow as pa

    from ucuddle_search_engine_spark.functions.analyze import make_flat_postings_fn

    fn = make_flat_postings_fn(None)
    pat = re.compile("[a-z0-9]+")

    def reference(ids, texts):
        ref = []
        for i, t in zip(ids, texts):
            toks = [] if t is None else pat.findall(t.lower())
            agg: dict[str, list[int]] = {}
            for p, tok in enumerate(toks):
                agg.setdefault(tok, []).append(p)
            for tok, ps in agg.items():
                ref.append((i, tok, len(ps), tuple(ps), len(toks)))
        return ref

    cases = [
        # pure ASCII (vectorized path)
        ["b a c a b", "", None, "...", "UPPER lower 42", "x " * 3000 + "y"],
        # non-ASCII present (whole slice falls back to the regex path)
        ["Café au lait", "ЖУРНАЛ Тест", "plain ascii", None, "İstanbul ß"],
    ]
    for texts in cases:
        ids = list(range(len(texts)))
        batch = pa.record_batch(
            [pa.array(ids, type=pa.int64()), pa.array(texts, type=pa.string())],
            names=["doc_id", "content"],
        )
        rows = []
        for out in fn(iter([batch])):
            rows += [
                (r["doc_id"], r["term"], r["tf"], tuple(r["positions"]), r["doclen"])
                for r in out.to_pylist()
            ]
        assert sorted(rows) == sorted(reference(ids, texts))

    # row ORDER parity on the vectorized path: docs in input order, terms in
    # first-appearance order within each doc
    batch = pa.record_batch(
        [pa.array([7, 8], type=pa.int64()), pa.array(["b a c a b", "z y z"], type=pa.string())],
        names=["doc_id", "content"],
    )
    out = list(fn(iter([batch])))[0].to_pylist()
    assert [(r["doc_id"], r["term"]) for r in out] == [
        (7, "b"), (7, "a"), (7, "c"), (8, "z"), (8, "y"),
    ]


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
