"""Phrase matching from stored positions vs a pure-python oracle."""

from __future__ import annotations

import re

import pytest

from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
from ucuddle_search_engine_spark.operators.phrase import phrase_match, phrase_search


@pytest.fixture(scope="module")
def idx(documents):
    return InvertedIndex.from_documents_table(documents).persist()


@pytest.fixture(scope="module")
def doc_texts(documents):
    return {r["doc_id"]: r["text"] for r in documents.collect()}


def _py_phrase_tf(text, phrase):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    n = len(phrase)
    return sum(1 for i in range(len(toks) - n + 1) if toks[i : i + n] == phrase)


@pytest.mark.parametrize("phrase", [["spark", "window"], ["table", "table"], ["a", "the", "line"]])
def test_phrase_match_oracle(idx, doc_texts, phrase):
    got = {r["doc_id"]: r["phrase_tf"] for r in phrase_match(idx.postings, phrase).collect()}
    exp = {d: c for d, t in doc_texts.items() if (c := _py_phrase_tf(t, phrase)) > 0}
    assert got == exp


def test_phrase_absent(idx):
    assert phrase_match(idx.postings, ["zz9absent", "table"]).count() == 0


def test_phrase_search_scored(idx, doc_texts):
    phrase = ["spark", "window"]
    out = phrase_search(idx.postings, idx.dstats, idx.cstats, phrase, k=5).collect()
    assert 0 < len(out) <= 5
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # top doc really contains the phrase
    assert _py_phrase_tf(doc_texts[out[0]["doc_id"]], phrase) > 0


def test_phrase_search_over_written_store(spark, tmp_path_factory):
    """Quoted-phrase top-k straight from a WRITTEN store's positional sidecar
    must equal the in-memory phrase engine — the corpus is never re-read."""
    from pyspark.sql import functions as F

    from ucuddle_search_engine_spark.plans.build_index import (
        build_index_resumable,
        phrase_search_written,
    )
    from ucuddle_search_engine_spark.synth import synth_corpus

    corpus = synth_corpus(spark, 300, partitions=4).cache()
    out = str(tmp_path_factory.mktemp("idx_phrase"))
    build_index_resumable(spark, corpus, out, n_units=2, write_postings=True)

    idx = InvertedIndex.build(corpus, num_shards=3)
    phrase = ["t0", "t1"]
    want = [(r["doc_id"], round(r["score"], 9)) for r in
            phrase_search(idx.postings.filter(F.col("field") == 0),
                          idx.dstats, idx.cstats, phrase, k=5).collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           phrase_search_written(spark, out, phrase, k=5).collect()]
    assert got == want and len(got) > 0

    # the Spark-free serving path (pyarrow sidecar read + numpy adjacency)
    # must rank and score identically to both engines
    import numpy as np

    from ucuddle_search_engine_spark.operators.phrase import phrase_search_local

    local = [(d, round(s, 9)) for d, s in phrase_search_local(out, phrase, k=5)]
    assert local == want

    # 3-term chain, absent term, single term — all three path-parity checked
    for ph in (["t0", "t1", "t0"], ["t0", "zzzabsent"], ["t1"]):
        w = [(r["doc_id"], round(r["score"], 9)) for r in
             phrase_search(idx.postings.filter(F.col("field") == 0),
                           idx.dstats, idx.cstats, ph, k=5).collect()]
        g = [(d, round(s, 9)) for d, s in phrase_search_local(out, ph, k=5)]
        assert g == w, ph

    # tombstoned docs vanish from matches AND the phrase df
    top_doc = want[0][0]
    dead = np.asarray([top_doc], dtype=np.int64)
    with_dead = phrase_search_local(out, phrase, k=5, dead=dead)
    assert top_doc not in [d for d, _ in with_dead] and with_dead

    # keys cache: cold fill, warm hit, and forced eviction all rank-identical;
    # tombstones still apply on cached (unfiltered) keys
    from ucuddle_search_engine_spark.operators.phrase import PhraseKeysCache

    pkc = PhraseKeysCache()
    cold = phrase_search_local(out, phrase, k=5, cache=pkc)
    assert [(d, round(s, 9)) for d, s in cold] == want and pkc._n > 0
    warm = phrase_search_local(out, phrase, k=5, cache=pkc)
    assert warm == cold
    assert phrase_search_local(out, phrase, k=5, dead=dead, cache=pkc) == with_dead
    tiny = PhraseKeysCache(max_keys=1)  # every term over budget → evict-churn
    assert phrase_search_local(out, phrase, k=5, cache=tiny) == cold
    # byte-charged LRU: resident bytes never exceed one entry's actual size
    # (a single over-budget entry is allowed to stay to serve its own query)
    assert tiny._n <= max((tiny._nbytes(v) for v in tiny._d.values()), default=0)
    assert len(tiny._d) <= 2  # the current query's terms at most, never growth


def test_phrase_local_rank_engine_and_fallback(spark, tmp_path_factory):
    """The content-field rank-bitmap engine must (a) actually engage on a
    healthy store, (b) agree exactly with the forced sorted-key engine, and
    (c) permanently fall back — with identical results — when docs.doclen
    understates the sidecar's position space (the self-validation that keeps
    an inconsistent store from ever matching across doc boundaries)."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    from ucuddle_search_engine_spark.operators import phrase as P
    from ucuddle_search_engine_spark.plans.build_index import build_index_resumable
    from ucuddle_search_engine_spark.synth import synth_corpus

    corpus = synth_corpus(spark, 200, partitions=2).cache()
    out = str(tmp_path_factory.mktemp("idx_rank"))
    build_index_resumable(spark, corpus, out, n_units=1, write_postings=True)

    phrase = ["t0", "t1"]
    want = P.phrase_search_local(out, phrase, k=5)
    assert (out, 0) not in P._RANK_INVALID and want  # rank engine ran clean
    P._RANK_INVALID.add((out, 0))
    try:
        assert P.phrase_search_local(out, phrase, k=5) == want  # key parity
    finally:
        P._RANK_INVALID.discard((out, 0))

    # corrupt docs.doclen to 1 → fill-time validation must reject the rank
    # form, flag the store, and the key engine must still serve exact results
    import glob
    import os as _os

    for f in glob.glob(_os.path.join(out, "docs", "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        ones = pds.dataset(f).to_table().column("doclen")
        import pyarrow as pa

        t = t.set_column(t.schema.get_field_index("doclen"), "doclen",
                         pa.array([1] * len(t), type=ones.type))
        pq.write_table(t, f)
    assert P.phrase_search_local(out, phrase, k=5) == want
    assert (out, 0) in P._RANK_INVALID
