"""Round-6 serving-tier scaling paths:

- _aggregate_scores stride mode: a modulo-sharded group's ids map onto dense
  LOCAL slots ((id - mn) // num_shards); results must equal the generic
  unique/scatter-add path bit-for-bit, and a mixed-residue input (stride
  assumption false) must fall back, not collide slots.
- the dense AND path and the warm-scored-memo TAAT flip must keep
  search_local bit-identical to the distributed search_terms ranking, warm
  and cold, at a non-default shard count.

Reference parity: the reference serves every query shape through one ES
scatter-gather (crawler/functs_with_elastic.go:75); these are engine-side
physical plan choices that must never change rankings.
"""

from __future__ import annotations

import numpy as np
import pytest

from ucuddle_search_engine_spark.operators.wand import _aggregate_scores


def _ref_aggregate(docs, contribs):
    uniq, inv = np.unique(docs, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, contribs)
    return uniq, scores


def test_stride_dense_matches_unique_path():
    rng = np.random.default_rng(7)
    st = 10
    # one residue class (shard 3 of 10), duplicated ids across "chains"
    docs = rng.integers(0, 50_000, size=20_000) * st + 3
    contribs = rng.random(20_000)
    u1, s1 = _aggregate_scores(docs, contribs, stride=st)
    u2, s2 = _ref_aggregate(docs, contribs)
    assert np.array_equal(u1, u2)
    # both paths accumulate in input order → bit-identical sums
    assert np.array_equal(s1, s2)


def test_stride_mixed_residues_falls_back():
    # ids from TWO residue classes: (id - mn) // st would collide 13 and 17
    # into one slot — the residue check must reject the stride map
    docs = np.array([13, 17, 13, 23, 27], dtype=np.int64)
    contribs = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
    u, s = _aggregate_scores(docs, contribs, stride=10)
    ru, rs = _ref_aggregate(docs, contribs)
    assert np.array_equal(u, ru) and np.allclose(s, rs)


def test_stride_one_unchanged():
    docs = np.array([5, 9, 5, 7], dtype=np.int64)
    contribs = np.array([1.0, 2.0, 3.0, 4.0])
    u, s = _aggregate_scores(docs, contribs, stride=1)
    ru, rs = _ref_aggregate(docs, contribs)
    assert np.array_equal(u, ru) and np.array_equal(s, rs)


@pytest.fixture(scope="module")
def sharded_store(spark, tmp_path_factory):
    """A 5-shard written store (store_meta.json carries the geometry) over a
    corpus whose term mix exercises head (t0/t1 in most docs), mid and tail
    chains — enough postings per doc that AND intersections are non-trivial."""
    from pyspark.sql import functions as F

    from ucuddle_search_engine_spark.plans.build_index import (
        build_index_resumable,
        load_searcher,
    )

    n = 600
    corpus = (
        spark.range(n)
        .select(
            F.lit("r").alias("repo"),
            F.concat(F.lit("f/"), F.col("id")).alias("path"),
            F.lit("c0").alias("commit"),
            F.lit("en").alias("lang"),
            F.concat_ws(
                " ",
                F.lit("t0 t1"),
                F.concat(F.lit("t"), (F.col("id") % 7)),
                F.concat(F.lit("t"), (F.col("id") % 29)),
                F.concat(F.lit("t"), (F.col("id") % 97)),
                F.concat(F.lit("tail"), F.col("id")),
            ).alias("content"),
        )
    )
    out = str(tmp_path_factory.mktemp("stride_store"))
    build_index_resumable(spark, corpus, out, n_units=2, num_shards=5)
    return load_searcher(spark, out)


QUERIES = [
    (["t0", "t1"], "or"),        # head-head → TAAT (stride-dense bincount)
    (["t3", "t11", "t42"], "or"),  # mixed → blockmax cold, scored-memo TAAT warm
    (["tail123"], "or"),          # tail → exact path
    (["t0", "t3"], "and"),        # head ∧ mid → dense AND
    (["t1", "t11", "t42"], "and"),
    (["t0", "absentterm"], "and"),  # absent term → empty
]


def test_sharded_serving_matches_distributed_warm_and_cold(sharded_store):
    """Parity at the repo's established 9-dp contract (what the bench
    asserts): serving-vs-distributed scores have always been allowed to
    differ in the last ulp across scorer families (the exact path computes
    w*(tf/denom), the scored memo w*tf/denom — same up to rounding), and
    the warm fast-path flips (scored-memo TAAT, dense AND) sit inside that
    contract too."""
    s = sharded_store
    assert s.num_shards == 5  # store_meta.json round-trips the geometry

    def r9(rows):
        return [(d, round(sc, 9)) for d, sc in rows]

    for terms, mode in QUERIES:
        want = r9((r["doc_id"], r["score"]) for r in
                  s.search_terms(terms, k=12, mode=mode).collect())
        got_cold = s.search_local(terms, k=12, mode=mode)
        # warm rep: scored memos now resident → the TAAT flip / dense-AND
        # fast paths engage; the ranking must not move
        got_warm = s.search_local(terms, k=12, mode=mode)
        assert r9(got_cold) == want, (terms, mode)
        assert r9(got_warm) == want, (terms, mode)


def test_sharded_offset_pagination_parity(sharded_store):
    s = sharded_store
    full = s.search_local(["t0", "t1"], k=30, mode="or")
    paged = s.search_local(["t0", "t1"], k=10, mode="or", offset=10)
    assert paged == full[10:20]


def test_dense_and_honors_tombstones(sharded_store):
    """The dense AND path filters dead docs from BOTH presence and scoring
    (the scored-chain memo is cached unfiltered; tombstones apply on
    retrieval, exactly like every other path) — successor docs fill the
    freed top-k slots."""
    s = sharded_store
    terms, mode = ["t0", "t3"], "and"
    before = s.search_local(terms, k=5, mode=mode)
    assert before
    saved = s.tombstones
    try:
        s.tombstones = [before[0][0]]
        after = s.search_local(terms, k=5, mode=mode)
        assert before[0][0] not in [d for d, _ in after]
        assert [(d, round(sc, 9)) for d, sc in after[:4]] == \
               [(d, round(sc, 9)) for d, sc in before[1:5]]
    finally:
        s.tombstones = saved
