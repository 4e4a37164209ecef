"""Store merge: two written indexes consolidate into one that is
block-identical to a fresh single-shot build over the union corpus — the
Lucene merge analogue, without re-tokenizing anything."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ucuddle_search_engine_spark.operators.postings import (
    FIELD_CONTENT,
    build_docs,
    build_postings_fast,
    doclens_from_docs,
)
from ucuddle_search_engine_spark.plans.build_index import build_index_resumable, load_searcher
from ucuddle_search_engine_spark.plans.merge import decode_store_postings, merge_stores
from ucuddle_search_engine_spark.operators.segments import build_segments
from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
from ucuddle_search_engine_spark.synth import synth_corpus


def _canon_segments(df):
    return sorted(
        (int(r["shard"]), r["term"], int(r["field"]), int(r["block_no"]),
         bytes(r["doc_bytes"]).hex(), bytes(r["tf_bytes"]).hex(), bytes(r["dl_bytes"]).hex(),
         round(r["max_impact"], 12))
        for r in df.collect()
    )


def test_merge_equals_fresh_build(spark, tmp_path_factory):
    """merge(store(A), store(B)) with overlapping keys (B wins) must produce
    the same docs, blocks, and search results as a fresh build over A ∪ B."""
    big = synth_corpus(spark, 220, partitions=4).cache()
    small = big.limit(0).unionByName(synth_corpus(spark, 150, partitions=4))  # A ⊂ B keys

    dir_a = str(tmp_path_factory.mktemp("store_a"))
    dir_b = str(tmp_path_factory.mktemp("store_b"))
    out = str(tmp_path_factory.mktemp("merged"))
    build_index_resumable(spark, small, dir_a, n_units=2)
    build_index_resumable(spark, big, dir_b, n_units=2)

    stats = merge_stores(spark, dir_a, dir_b, out)
    assert stats["n_docs"] == 220

    # block-identical to the single-shot encoder over the union corpus
    docs = build_docs(big, num_shards=3, scale_ids="prefix")
    postings = build_postings_fast(docs)
    from ucuddle_search_engine_spark.operators.postings import collection_stats

    cstats = collection_stats(doclens_from_docs(docs))
    fresh = build_segments(postings, None, cstats, num_shards=3)
    merged_segs = spark.read.parquet(os.path.join(out, "segments")).drop("tb", "unit")
    assert _canon_segments(merged_segs) == _canon_segments(fresh)

    # and the merged store ANSWERS like the exact engine over the union
    searcher = load_searcher(spark, out)
    idx = InvertedIndex.build(big, num_shards=3)
    for terms, mode in ((["t0", "t1"], "or"), (["t0", "t1"], "and"), (["module", "t3"], "or")):
        got = [(r["doc_id"], round(r["score"], 9)) for r in
               searcher.search_terms(terms, k=10, mode=mode).collect()]
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                idx.search_terms(terms, k=10, mode=mode).collect()]
        assert got == want, (terms, mode)


def test_merge_expunges_tombstones(spark, tmp_path_factory):
    """Tombstoned docs of either input vanish from the merged store's docs
    AND postings (Lucene expunge-deletes-on-merge)."""
    corpus = synth_corpus(spark, 120, partitions=4).cache()
    other = synth_corpus(spark, 60, partitions=2)
    dir_a = str(tmp_path_factory.mktemp("ta"))
    dir_b = str(tmp_path_factory.mktemp("tb"))
    out = str(tmp_path_factory.mktemp("tm"))
    build_index_resumable(spark, corpus, dir_a, n_units=2)
    build_index_resumable(spark, other, dir_b, n_units=2)
    dead = [3, 7]
    spark.createDataFrame([(i,) for i in dead], "doc_id long").write.parquet(
        os.path.join(dir_a, "tombstones")
    )
    dead_keys = {(r["repo"], r["path"]) for r in
                 spark.read.parquet(os.path.join(dir_a, "docs")).filter(F.col("doc_id").isin(dead))
                 .select("repo", "path").collect()}
    merge_stores(spark, dir_a, dir_b, out)
    mdocs = spark.read.parquet(os.path.join(out, "docs"))
    keys = {(r["repo"], r["path"]) for r in mdocs.select("repo", "path").collect()}
    # dead keys survive ONLY if store B also carries them (B had no tombstone)
    b_keys = {(r["repo"], r["path"]) for r in
              spark.read.parquet(os.path.join(dir_b, "docs")).select("repo", "path").collect()}
    for kk in dead_keys:
        assert (kk in keys) == (kk in b_keys)
    # postings doc ids all exist in merged docs (no orphaned postings)
    segs = spark.read.parquet(os.path.join(out, "segments"))
    post_ids = {r["doc_id"] for r in decode_store_postings(segs).select("doc_id").distinct().collect()}
    doc_ids = {r["doc_id"] for r in mdocs.select("doc_id").collect()}
    assert post_ids <= doc_ids


def test_merge_carries_analyzer(spark, tmp_path_factory):
    """Merging analyzer-built stores must (a) refuse mismatched analyzers,
    (b) copy analyzer.json into the merged store, and (c) recompute the title
    avgdl with THAT analyzer — so the merged store's query side still analyzes
    exactly like its index side (search_analyzer == index analyzer pin)."""
    import json

    from ucuddle_search_engine_spark.functions.analyze import ANALYZERS
    from ucuddle_search_engine_spark.plans.build_index import load_analyzer

    an = ANALYZERS["en"]
    big = synth_corpus(spark, 120, partitions=4).cache()
    small = big.limit(0).unionByName(synth_corpus(spark, 80, partitions=2))
    dir_a = str(tmp_path_factory.mktemp("an_a"))
    dir_b = str(tmp_path_factory.mktemp("an_b"))
    out = str(tmp_path_factory.mktemp("an_m"))
    build_index_resumable(spark, small, dir_a, n_units=2, analyzer=an)
    build_index_resumable(spark, big, dir_b, n_units=2, analyzer=an)

    merge_stores(spark, dir_a, dir_b, out)
    assert load_analyzer(out) == an  # config carried

    # cstats must equal a fresh analyzer build over the union (title avgdl
    # tokenized with the analyzer, not the identity tokenizer)
    fresh_dir = str(tmp_path_factory.mktemp("an_f"))
    build_index_resumable(spark, big, fresh_dir, n_units=2, analyzer=an)
    def cs(d):
        with open(os.path.join(d, "cstats.json")) as f:
            return sorted((r["field"], r["n_docs"], round(r["avgdl"], 9)) for r in json.load(f))
    assert cs(out) == cs(fresh_dir)

    # mismatched analyzers must refuse to merge
    plain_dir = str(tmp_path_factory.mktemp("an_p"))
    build_index_resumable(spark, small, plain_dir, n_units=2)  # identity analyzer
    with pytest.raises(ValueError, match="different analyzers"):
        merge_stores(spark, plain_dir, dir_b, str(tmp_path_factory.mktemp("an_x")))


def test_merge_many_three_way(spark, tmp_path_factory):
    """N-way merge: three stores with overlapping keys — the RIGHTMOST store
    wins each (repo, path) conflict, and the merged store is block-identical
    to a fresh single-shot build over the resolved union."""
    big = synth_corpus(spark, 200, partitions=4).cache()
    s1 = big.limit(0).unionByName(synth_corpus(spark, 90, partitions=2))
    s2 = big.limit(0).unionByName(synth_corpus(spark, 150, partitions=3))
    dirs = [str(tmp_path_factory.mktemp(f"m3_{i}")) for i in range(3)]
    out = str(tmp_path_factory.mktemp("m3_out"))
    from ucuddle_search_engine_spark.plans.merge import merge_many

    build_index_resumable(spark, s1, dirs[0], n_units=2)
    build_index_resumable(spark, s2, dirs[1], n_units=2)
    build_index_resumable(spark, big, dirs[2], n_units=2)
    stats = merge_many(spark, dirs, out)
    assert stats["n_docs"] == 200  # keys are nested subsets; rightmost = big

    docs = build_docs(big, num_shards=3, scale_ids="prefix")
    from ucuddle_search_engine_spark.operators.postings import collection_stats

    cstats = collection_stats(doclens_from_docs(docs))
    fresh = build_segments(build_postings_fast(docs), None, cstats, num_shards=3)
    merged_segs = spark.read.parquet(os.path.join(out, "segments")).drop("tb", "unit")
    assert _canon_segments(merged_segs) == _canon_segments(fresh)


def test_merge_aligns_mismatched_doc_columns(spark, tmp_path_factory):
    """Merging stores whose docs schemas differ (e.g. an older store without
    added_at) must neither raise nor drop the newer column — missing values
    backfill as nulls, in either merge order, and `since` keeps working on
    the merged output."""
    a = synth_corpus(spark, 120, partitions=2).cache()
    b = synth_corpus(spark, 80, partitions=2)
    dir_a = str(tmp_path_factory.mktemp("align_a"))
    dir_b = str(tmp_path_factory.mktemp("align_b"))
    build_index_resumable(spark, a, dir_a, n_units=2)
    build_index_resumable(spark, b, dir_b, n_units=2)

    # strip added_at from store A's docs — simulating a pre-r3 store
    docs_path = os.path.join(dir_a, "docs")
    old = spark.read.parquet(docs_path).drop("added_at")
    assert "added_at" in spark.read.parquet(os.path.join(dir_b, "docs")).columns
    tmp = docs_path + ".tmp"
    old.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(docs_path)
    os.replace(tmp, docs_path)

    for first, second in [(dir_b, dir_a), (dir_a, dir_b)]:
        out = str(tmp_path_factory.mktemp("align_out"))
        merge_stores(spark, first, second, out)
        merged = spark.read.parquet(os.path.join(out, "docs"))
        assert "added_at" in merged.columns  # newer column survives
        n_null = merged.filter(F.col("added_at").isNull()).count()
        n_set = merged.filter(F.col("added_at").isNotNull()).count()
        assert n_null > 0 and n_null + n_set == 120
    # with the NEWER store rightmost (it wins the 80 overlaps), its stamps
    # survive the merge; only the 40 old-store-only docs are null
    assert n_set == 80 and n_null == 40


def test_merge_carries_positional_sidecar(spark, tmp_path_factory):
    """When every input store has the positions sidecar, the merged store
    keeps it (remapped to the fresh ids) — phrase search over the merged
    store equals phrase search over a fresh build of the union corpus."""
    from ucuddle_search_engine_spark.plans.build_index import phrase_search_written

    big = synth_corpus(spark, 180, partitions=4).cache()
    small = big.limit(0).unionByName(synth_corpus(spark, 120, partitions=4))
    dir_a = str(tmp_path_factory.mktemp("pos_a"))
    dir_b = str(tmp_path_factory.mktemp("pos_b"))
    out = str(tmp_path_factory.mktemp("pos_m"))
    fresh = str(tmp_path_factory.mktemp("pos_f"))
    build_index_resumable(spark, small, dir_a, n_units=2, write_postings=True)
    build_index_resumable(spark, big, dir_b, n_units=2, write_postings=True)
    build_index_resumable(spark, big, fresh, n_units=2, write_postings=True)

    merge_stores(spark, dir_a, dir_b, out)
    assert os.path.isdir(os.path.join(out, "postings"))
    phrase = ["t0", "t1"]  # adjacent in hundreds of synth docs
    got = [(r["doc_id"], round(r["score"], 6)) for r in
           phrase_search_written(spark, out, phrase, k=10).collect()]
    want = [(r["doc_id"], round(r["score"], 6)) for r in
            phrase_search_written(spark, fresh, phrase, k=10).collect()]
    assert got == want and got
