"""Structured Streaming ingest: continuous corpus → postings micro-batches.

The reference's "streaming" is a polling batch loop — crawlers fetch work
batches forever (crawler/main.go:451-515). Its natural Spark expression is a
file-source streaming query: new corpus parquet files appearing under a
directory are tokenized and committed to a postings sink exactly once:
the checkpoint gives at-least-once batch EXECUTION, and each micro-batch
writes (mode=overwrite) its own epoch-keyed subdirectory, so a retried
epoch replaces its previous partial/complete output instead of appending a
duplicate copy — together that is the same at-least-once-claim /
exactly-once-commit contract the task-manager's taken/parsed flags provide.

foreachBatch is used so each micro-batch can run the same build_postings
DataFrame plan as the batch path (plan parity between batch and streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_prefix_long
from ..operators.postings import FIELD_CONTENT, build_docs, build_postings, doclens_from_docs
from ..operators.postings import collection_stats
from ..schema import CORPUS_SCHEMA


def _stream_doc_key():
    """Natural streamed doc identity: md5-prefix long of repo/path (dense ids
    are impossible mid-stream — future files unknown)."""
    return md5_prefix_long(F.concat_ws("/", "repo", "path"))


def stream_postings(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_key",
):
    """Start (and return) a streaming query appending postings parquet.

    Streaming doc identity: global sort-based ids are impossible mid-stream
    (future files unknown), so the stream keys postings by the natural key
    md5(repo/path) — the same determinism the batch path gets from dense rank;
    a compaction job can remap to dense ids later.
    """
    src = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        import os

        docs = batch.withColumn("doc_id", _stream_doc_key())
        postings = build_postings(docs, fields={FIELD_CONTENT: "content"})
        # idempotent per-epoch commit: a crash AFTER this write but BEFORE
        # the checkpoint records the epoch re-runs process() with the SAME
        # epoch_id on restart — overwrite replaces the orphaned copy, where
        # a flat append would double every posting of that batch (and the
        # compacted store would double tf/df)
        postings.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={int(epoch_id)}"))

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_streamed_postings(
    spark: SparkSession,
    corpus_dir: str,
    postings_dir: str,
    num_shards: int = 3,
    block_size: int = 128,
) -> DataFrame:
    """The promised dense-id remap + segment encode for a streamed postings
    sink: once the corpus directory is complete (or at a compaction point),
    remap the stream's md5-key doc ids to the batch path's dense ranks and
    encode the SAME compressed segment store a batch build would produce
    (tests/test_streaming_multimodal.py asserts block-level equality).

    Plan shape: one scan of the corpus for the (hash_id → doc_id, doclen)
    mapping, one hash join against the streamed postings on hash_id, then the
    standard single-wide-exchange segment encode. The join key is the md5
    hash — uniformly distributed, no skew salting needed.
    """
    segs, _docs, _dstats = _compact_parts(spark, corpus_dir, postings_dir,
                                          num_shards, block_size)
    return segs


def _compact_parts(spark, corpus_dir, postings_dir, num_shards, block_size):
    """(segments, docs, dstats) for a compaction — one docs plan shared by
    the segment encode, the docs write, and cstats, so a caller that
    persists `docs` runs the corpus scan + dense-rank sort once instead of
    once per action (compact_to_store does exactly that)."""
    from ..operators.segments import build_segments

    corpus = spark.read.parquet(corpus_dir)
    docs = build_docs(corpus, num_shards=num_shards)
    mapping = docs.select(_stream_doc_key().alias("hash_id"), "doc_id")
    # recursiveFileLookup: the sink is epoch-partitioned for idempotent
    # retries (stream_postings); read the files flat so no epoch column
    # rides into the postings schema
    streamed = spark.read.option("recursiveFileLookup", "true").parquet(postings_dir)
    remapped = (
        streamed.withColumnRenamed("doc_id", "hash_id")
        .join(mapping, "hash_id")
        .drop("hash_id")
    )
    dstats = doclens_from_docs(docs, fields={FIELD_CONTENT: "content"})
    cstats = collection_stats(dstats)
    segs = build_segments(remapped, dstats, cstats, num_shards=num_shards,
                          block_size=block_size)
    return segs, docs, dstats


def compact_to_store(
    spark: SparkSession,
    corpus_dir: str,
    postings_dir: str,
    out_dir: str,
    num_shards: int = 3,
    block_size: int = 128,
) -> None:
    """Compaction point → a full SERVABLE store: the streamed micro-batches
    become the same on-disk layout a batch build writes (docs +
    tb-partitioned segments + tstats dictionary + cstats.json), ready for
    SegmentSearcher.open_local and plans.merge.merge_many. This is the glue
    of the ES freshness analogue (Refresh:"true",
    crawler/functs_with_elastic.go:321): stream all day, compact, merge into
    the served store — tests/test_streaming_multimodal.py drives the whole
    chain through a live HTTP server without restart."""
    import json
    import os

    from ..plans.build_index import SEG_ROW_GROUP_BYTES, TERM_BUCKETS, write_tstats

    os.makedirs(out_dir, exist_ok=True)
    segs, docs, dstats = _compact_parts(
        spark, corpus_dir, postings_dir, num_shards, block_size)
    # persist docs: its dense-rank plan is embedded in segs (id mapping +
    # doclens) AND written below AND feeds cstats — caching it makes the
    # corpus scan + global sort run once across all four actions instead
    # of once each (CacheManager matches the shared logical plan)
    docs = docs.persist()
    segs = segs.persist()
    (
        segs.withColumn("tb", F.pmod(md5_prefix_long("term"), F.lit(TERM_BUCKETS)).cast("int"))
        .repartition("tb")
        .sortWithinPartitions("tb", "term", "field", "shard", "block_no")
        .write.mode("overwrite")
        .option("parquet.block.size", SEG_ROW_GROUP_BYTES)
        .partitionBy("tb")
        .parquet(os.path.join(out_dir, "segments/unit=0"))
    )
    tstats = segs.groupBy("term", "field").agg(F.sum("n").alias("df"))
    write_tstats(tstats, out_dir)
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs/unit=0"))
    # cstats.json must be EXACTLY what build_segments baked into max_impact
    # (a diverging avgdl would shift recomputed scores a ULP off the stored
    # block bounds) — so it comes from the same collection_stats plan
    with open(os.path.join(out_dir, "cstats.json"), "w") as f:
        json.dump([r.asDict() for r in collection_stats(dstats).collect()], f)
    with open(os.path.join(out_dir, "store_meta.json"), "w") as f:
        json.dump({"num_shards": num_shards, "sharding": "mod",
                   "block_size": block_size}, f)
    segs.unpersist()
    docs.unpersist()
