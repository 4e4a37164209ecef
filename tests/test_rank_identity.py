"""Rank-identity e2e: engine top-k (doc_id, score) must equal the pure-pandas
exact BM25 oracle (SURVEY.md §5.2-2). Ranks exact; scores to 1e-9."""

from __future__ import annotations

import random

import pytest

from tests.oracle import bm25_topk, tokenize
from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex

QUERIES = [
    ("spark", "and"),
    ("table window", "and"),
    ("spark window merge", "and"),
    ("customer query value", "and"),
    ("table missingterm12345", "and"),   # absent term → empty under AND
    ("table missingterm12345", "or"),
    ("batch stream group order", "or"),
]


@pytest.fixture(scope="module")
def idx(documents):
    return InvertedIndex.from_documents_table(documents).persist()


@pytest.fixture(scope="module")
def doc_texts(documents):
    return {r["doc_id"]: r["text"] for r in documents.select("doc_id", "text").collect()}


def check(idx, doc_texts, terms, mode, k=10):
    got = [(r["doc_id"], r["score"]) for r in idx.search_terms(terms, k=k, mode=mode).collect()]
    exp = bm25_topk(doc_texts, terms, k=k, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in exp], f"rank mismatch for {terms} ({mode})"
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-9


def test_fixed_queries(idx, doc_texts):
    for q, mode in QUERIES:
        check(idx, doc_texts, q.split(), mode)


def test_randomized_queries(idx, doc_texts):
    """Property-ish (SURVEY.md §5.2-5): random term subsets at seed=42."""
    rng = random.Random(42)
    vocab = sorted({t for text in doc_texts.values() for t in tokenize(text)})
    for _ in range(10):
        terms = rng.sample(vocab, rng.randint(1, 4))
        mode = rng.choice(["and", "or"])
        check(idx, doc_texts, terms, mode)


def test_full_search_path(idx):
    """search(): analyzer parity + length guard + display join."""
    out = idx.search("spark window", k=5).collect()
    assert 0 < len(out) <= 5
    assert out == sorted(out, key=lambda r: (-r["score"], r["doc_id"]))
    assert idx.search("ab", k=5).count() == 0  # <3 chars guard (web/app.py:30)
