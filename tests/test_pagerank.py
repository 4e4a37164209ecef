"""PageRank: closed-form graphs (FIXTURES.md §4 — analogue of the reference's
files/page_rank_test_domains.json / PG_test2.json fixtures), mass conservation,
link extraction, and blend re-rank sufficiency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
from ucuddle_search_engine_spark.operators.pagerank import (
    blend_scores,
    blend_topk_exact,
    extract_links,
    pagerank,
)
from ucuddle_search_engine_spark.synth import synth_corpus

D = 0.85


def _run(spark, edges, n, iters=100):
    e = spark.createDataFrame(edges, "src_doc_id long, dst_doc_id long")
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    return {r["doc_id"]: r["pagerank"] for r in pagerank(e, ids, iterations=iters).collect()}


def test_cycle_uniform(spark):
    """Directed cycle: symmetric → uniform ranks 1/n."""
    n = 5
    pr = _run(spark, [(i, (i + 1) % n) for i in range(n)], n, iters=40)
    for v in pr.values():
        assert abs(v - 1.0 / n) < 1e-9  # exact from iteration 1 by symmetry
    assert abs(sum(pr.values()) - 1.0) < 1e-9


def test_star_closed_form(spark):
    """Star: leaves 1..m point at hub 0; hub is dangling.

    Closed form with uniform dangling redistribution (n = m+1):
      leaf = (1-d)/n + d·hub/n
      hub  = (1-d)/n + d·(m·leaf + hub/n)
    """
    m = 4
    n = m + 1
    pr = _run(spark, [(i, 0) for i in range(1, n)], n, iters=110)
    # solve the 2×2 fixed point exactly
    # leaf = a + b·hub ; hub = a + d·m·leaf + b·hub  with a=(1-d)/n, b=d/n
    a, b = (1 - D) / n, D / n
    hub = (a + D * m * a) / (1 - b - D * m * b)
    leaf = a + b * hub
    assert abs(pr[0] - hub) < 1e-6
    for i in range(1, n):
        assert abs(pr[i] - leaf) < 1e-6
    assert abs(sum(pr.values()) - 1.0) < 1e-9


def test_dangling_chain_mass_conserved(spark):
    """Chain 0→1→2, node 2 dangling; Σrank must stay 1."""
    pr = _run(spark, [(0, 1), (1, 2)], 3, iters=60)
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert pr[2] > pr[1] > pr[0]


def test_disconnected_components(spark):
    """Two 2-cycles: each component keeps Σ=0.5 by symmetry."""
    pr = _run(spark, [(0, 1), (1, 0), (2, 3), (3, 2)], 4, iters=40)
    for v in pr.values():
        assert abs(v - 0.25) < 1e-9  # exact by symmetry


def test_convergence_tol(spark):
    e = [(i, (i + 1) % 6) for i in range(6)]
    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edf = spark.createDataFrame(e, "src_doc_id long, dst_doc_id long")
    pr = pagerank(edf, ids, iterations=30, tol=1e-12)
    vals = [r["pagerank"] for r in pr.collect()]
    assert all(abs(v - 1 / 6) < 1e-9 for v in vals)


@pytest.fixture(scope="module")
def small_idx(spark):
    corpus = synth_corpus(spark, 600, partitions=4).cache()
    return InvertedIndex.build(corpus, num_shards=3).persist()


def test_extract_links(small_idx):
    """Synth embeds ref:// tokens with preferential attachment: edges resolve
    to real docs, no self-loops, low doc-index targets are over-represented."""
    edges = extract_links(small_idx.docs).cache()
    n_edges = edges.count()
    assert n_edges > 100
    assert edges.filter(F.col("src_doc_id") == F.col("dst_doc_id")).count() == 0
    # all endpoints are valid doc ids
    ids = small_idx.docs.select("doc_id")
    assert edges.join(ids, edges.dst_doc_id == ids.doc_id, "left_anti").count() == 0
    # hub skew: top-1% of targets hold a large share of in-links
    indeg = edges.groupBy("dst_doc_id").count().orderBy(F.col("count").desc())
    top = indeg.limit(6).agg(F.sum("count")).first()[0]
    assert top / n_edges > 0.10


def test_pagerank_on_synth_and_blend(small_idx):
    edges = extract_links(small_idx.docs)
    ids = small_idx.docs.select("doc_id")
    pr = pagerank(edges, ids, iterations=15).cache()
    total = pr.agg(F.sum("pagerank")).first()[0]
    assert abs(total - 1.0) < 1e-6
    # blend re-rank sufficiency: top-10 of blend over ALL scored docs must
    # equal the bounded candidate re-rank (doubles k' until provably enough)
    terms = ["t0", "t1"]
    full = small_idx.search_terms(terms, k=10_000, mode="or")
    top_full = [(r["doc_id"], r["score"]) for r in blend_scores(full, pr).limit(10).collect()]
    top_cand = blend_topk_exact(
        lambda kk: small_idx.search_terms(terms, k=kk, mode="or"), pr, k=10
    )
    assert [d for d, _ in top_full] == [d for d, _ in top_cand]
    for (_, a), (_, b) in zip(top_full, top_cand):
        assert abs(a - b) < 1e-9
