"""Structured Streaming ingest: continuous corpus → postings micro-batches.

The reference's "streaming" is a polling batch loop — crawlers fetch work
batches forever (crawler/main.go:451-515). Its natural Spark expression is a
file-source streaming query: new corpus parquet files appearing under a
directory are tokenized and appended to a postings sink exactly once
(checkpointed), which is the same at-least-once-claim / exactly-once-commit
contract the task-manager's taken/parsed flags provide.

foreachBatch is used so each micro-batch can run the same build_postings
DataFrame plan as the batch path (plan parity between batch and streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.postings import FIELD_CONTENT, build_postings
from ..schema import CORPUS_SCHEMA


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
    from pyspark.sql import functions as F

    src = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)

    def process(batch: DataFrame, epoch_id: int) -> None:
        docs = batch.withColumn(
            "doc_id",
            F.conv(F.substring(F.md5(F.concat_ws("/", "repo", "path")), 1, 15), 16, 10).cast("long"),
        )
        postings = build_postings(docs, fields={FIELD_CONTENT: "content"})
        postings.write.mode("append").parquet(out_dir)

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
