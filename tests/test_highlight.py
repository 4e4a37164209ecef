"""Snippet/highlight (C7) + title capitalization (C6) — the reference's
post-processing of hits (web/elastic_interaction.py:80-99) computed natively
from stored postings positions."""

from __future__ import annotations

import re

import pytest

from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
from ucuddle_search_engine_spark.operators.highlight import (
    _snippet,
    capitalize_title,
    highlight_hits,
)


def test_snippet_unit():
    text = "Alpha beta gamma delta epsilon zeta eta theta"
    s = _snippet(text, [2, 4])
    assert "<b>gamma</b>" in s and "<b>epsilon</b>" in s
    assert "Alpha" in s  # original casing preserved
    assert _snippet(text, []) == ""
    assert _snippet("", []) == ""
    # positions beyond token count are ignored
    assert _snippet("one two", [99]) == ""


def test_snippet_window_ellipsis():
    toks = [f"w{i}" for i in range(100)]
    text = " ".join(toks)
    s = _snippet(text, [50])
    assert "<b>w50</b>" in s
    assert s.startswith("… ") and s.endswith(" …")
    assert "w0 " not in s


def test_capitalize_title(spark):
    df = spark.createDataFrame([("hello world",), ("x",), ("",)], "t string")
    vals = [r[0] for r in df.select(capitalize_title("t")).collect()]
    assert vals == ["Hello world", "X", ""]


@pytest.fixture(scope="module")
def idx(documents):
    return InvertedIndex.from_documents_table(documents).persist()


def test_highlight_hits_end_to_end(idx):
    terms = ["spark", "window"]
    topk = idx.search_terms(terms, k=5, mode="and")
    out = highlight_hits(topk, idx.docs, idx.postings, terms).collect()
    assert len(out) == topk.count()
    for r in out:
        bolded = set(re.findall(r"<b>(\w+)</b>", r["snippet"]))
        assert bolded <= set(terms)
        assert len(bolded) >= 1
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
