"""Training-corpus preparation operators (operators/corpus): determinism and
two-phase-prefix-sum correctness — the value checks run against the DuckDB
oracle via the driver queries; these pin the scale-path invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ucuddle_search_engine_spark.operators.corpus import (
    ngram_overlap_flags,
    pack_documents,
    stratified_sample,
    unigram_logprob,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_pack_bucket_size_invariant(spark):
    """pack_id must be a pure function of (id order, token counts, budget) —
    the bucket_size used by the two-phase prefix sum is an execution detail
    and must not change the result."""
    docs = _docs(spark)
    a = {r["doc_id"]: r["pack_id"] for r in pack_documents(docs, 1500, bucket_size=37).collect()}
    b = {r["doc_id"]: r["pack_id"] for r in pack_documents(docs, 1500, bucket_size=1000).collect()}
    assert a == b
    # packs are contiguous, start at 0, and non-decreasing in id order
    packs = [a[d] for d in sorted(a)]
    assert packs[0] == 0
    assert all(y - x in (0, 1) for x, y in zip(packs, packs[1:])) or max(packs) == 0


def test_stratified_sample_deterministic(spark):
    docs = _docs(spark)
    frac = {"en": 0.5, "de": 1.0}
    a = sorted(r["doc_id"] for r in stratified_sample(docs, frac).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs.repartition(7), frac).collect())
    assert a == b and len(a) > 0
    langs = {r["lang"] for r in stratified_sample(docs, frac).select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # unlisted strata drop
    n_de_all = docs.filter(F.col("lang") == "de").count()
    n_de_kept = stratified_sample(docs, frac).filter(F.col("lang") == "de").count()
    assert n_de_kept == n_de_all  # fraction 1.0 keeps everything


def test_decontamination_flags_planted_overlap(spark):
    """A doc sharing an 8-gram with the benchmark is flagged; others are not."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (1, "completely unrelated words with nothing shared at all here today"),
        (2, "prefix words then the quick brown fox jumps over the lazy dog suffix"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    got = {r["doc_id"]: r["n_shared"] for r in ngram_overlap_flags(docs, bench, n=8).collect()}
    assert set(got) == {0, 2}
    assert got[0] == 2 and got[2] == 2  # two 8-grams inside the 9-token phrase


def test_unigram_logprob_orders_garbage_last(spark):
    """A doc of corpus-frequent tokens must score higher (less negative) than
    a doc of singleton tokens."""
    rows = [(i, "common words appear here " * 5) for i in range(6)]
    rows.append((100, "zzqx vvbn qqrs ttuy wwop"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob(docs).collect()}
    assert got[100] < got[0]


def test_build_training_shards_end_to_end(spark, tmp_path_factory):
    """The composed pipeline (gate → dedup → mix → pack → shard write) must
    produce directory-readable packs whose membership equals the chained
    individual operators, with no doc over budget boundaries violated
    (each pack's token prefix stays contiguous in id order)."""
    from ucuddle_search_engine_spark.plans.corpus_pipeline import build_training_shards

    docs = _docs(spark)
    out = str(tmp_path_factory.mktemp("shards"))
    fractions = {"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0, "und": 1.0}
    stats = build_training_shards(spark, docs, out, fractions, budget=1500)
    assert stats["n_kept"] > 0 and stats["n_packs"] >= 1
    shards = spark.read.parquet(out + "/shards")
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["pack_id"]) for r in shards.collect()
    )
    # pack ids are the exclusive-prefix-sum chunks over the KEPT set, id order
    acc = 0
    for doc_id, n_tokens, pack_id in rows:
        assert pack_id == acc // 1500, (doc_id, acc, pack_id)
        acc += n_tokens
    # partition layout: pack dirs on disk
    import os as _os
    assert any(d.startswith("pack_id=") for d in _os.listdir(out + "/shards"))
