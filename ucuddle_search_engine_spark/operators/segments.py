"""Compressed segment store: the engine's native replacement for the Lucene
segments the reference gets from Elasticsearch (index creation at
crawler/functs_with_elastic.go:208-243; shard count :75).

Layout (SURVEY.md §4.3 custom #2, BASELINE.json north_star):
- **document-sharded** — shard = pmod(doc_id, S), the ES number_of_shards
  model. Every query term's postings for a given doc live in the same shard,
  so per-shard top-k (WAND) needs no cross-shard traffic and the global answer
  is a k-way merge of per-shard top-k, exactly ES scatter-gather.
- per (shard, term): doc-ordered blocks of ≤ block_size postings, each block a
  row: delta+varbyte doc ids, varbyte tfs, varbyte doclens, and block-max
  metadata (max_impact = max BM25 tf-norm in block, idf excluded) for WAND.
- persisted as parquet partitioned by shard, sorted by (term, block_no) within
  files → Catalyst partition pruning on shard + row-group min/max pruning on
  term make a term lookup a pruned scan (pushdown via layout, §4.1).

Scale posture: the encode shuffle keys on (shard, term); a head term's group
is bounded by the shard's doc count (df_shard ≤ docs/S), NOT by global df —
shard count grows with the corpus, so Zipf head terms cannot overwhelm one
task. That is the explicit skew-splitting the north_rule requires, realized
through the shard dimension.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.varbyte import decode_doc_ids, encode_doc_ids, vb_decode, vb_encode
from .bm25 import B, K1

DEFAULT_BLOCK = 128

SEGMENT_COLS = (
    "shard int, term string, field int, block_no int, n int, min_doc long, max_doc long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, max_tf long, max_impact double"
)


def build_segments(
    postings: DataFrame,
    dstats: DataFrame,
    cstats: DataFrame,
    num_shards: int = 3,
    block_size: int = DEFAULT_BLOCK,
) -> DataFrame:
    """postings (term, doc_id, field, tf) → compressed block rows.

    avgdl/doclen are folded in at build time so each block row carries its own
    exact max_impact (tf_norm is monotone ↑ in tf and ↓ in doclen, but we take
    the max over the *actual* per-posting tf_norm — a tight bound).
    """
    enriched = (
        postings.join(dstats, ["doc_id", "field"])
        .join(F.broadcast(cstats), ["field"])
        .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(num_shards)).cast("int"))
        .select("shard", "term", "field", "doc_id", "tf", "doclen", "avgdl")
    )

    seg_columns = [
        "shard", "term", "field", "block_no", "n", "min_doc", "max_doc",
        "doc_bytes", "tf_bytes", "dl_bytes", "max_tf", "max_impact",
    ]

    def encode_group(shard, term, fld, g: pd.DataFrame, out: list) -> None:
        docs = g["doc_id"].to_numpy(np.int64)
        tfs = g["tf"].to_numpy(np.int64)
        dls = g["doclen"].to_numpy(np.int64)
        avgdl = float(g["avgdl"].iloc[0])
        impacts = tfs / (tfs + K1 * (1 - B + B * dls / avgdl))
        for b, start in enumerate(range(0, len(docs), block_size)):
            sl = slice(start, start + block_size)
            d, t, L, imp = docs[sl], tfs[sl], dls[sl], impacts[sl]
            out.append(
                (
                    int(shard), term, int(fld), b, len(d), int(d[0]), int(d[-1]),
                    encode_doc_ids(d.astype(np.uint64)),
                    vb_encode(t.astype(np.uint64)),
                    vb_encode(L.astype(np.uint64)),
                    int(t.max()), float(imp.max()),
                )
            )

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Input is sorted by (shard, term, field, doc_id) within the partition,
        # but Arrow batches can split a group — buffer the trailing group and
        # carry it into the next batch.
        carry: pd.DataFrame | None = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            last_key = tuple(pdf.iloc[-1][["shard", "term", "field"]])
            out: list = []
            carry_next = None
            for key, g in pdf.groupby(["shard", "term", "field"], sort=False):
                if key == last_key:
                    carry_next = g  # may continue in the next batch
                else:
                    encode_group(*key, g, out)
            carry = carry_next
            if out:
                yield pd.DataFrame(out, columns=seg_columns)
        if carry is not None and len(carry):
            out = []
            key = tuple(carry.iloc[0][["shard", "term", "field"]])
            encode_group(*key, carry, out)
            yield pd.DataFrame(out, columns=seg_columns)

    # one shuffle keyed (shard, term): all blocks of a (shard, term) live in one
    # partition; sortWithinPartitions makes groups contiguous and doc-ordered
    parted = enriched.repartition("shard", "term").sortWithinPartitions(
        "shard", "term", "field", "doc_id"
    )
    return parted.mapInPandas(encode, schema=SEGMENT_COLS)


def write_segments(segments: DataFrame, path: str) -> None:
    (
        segments.repartition("shard")
        .sortWithinPartitions("term", "field", "block_no")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_segments(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def decode_segment_rows(rows: pd.DataFrame) -> pd.DataFrame:
    """Inverse of build_segments for one (shard, term, field): block rows →
    (doc_id, tf, doclen) posting frame. Used by WAND and round-trip tests."""
    rows = rows.sort_values("block_no")
    docs = np.concatenate([decode_doc_ids(b) for b in rows["doc_bytes"]])
    tfs = np.concatenate([vb_decode(b) for b in rows["tf_bytes"]])
    dls = np.concatenate([vb_decode(b) for b in rows["dl_bytes"]])
    return pd.DataFrame({"doc_id": docs.astype(np.int64), "tf": tfs.astype(np.int64), "doclen": dls.astype(np.int64)})
