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

from ..functions.varbyte import decode_doc_ids, vb_decode, vb_encode_with_offsets
from .bm25 import B, K1

DEFAULT_BLOCK = 128

SEGMENT_COLS = (
    "shard int, term string, field int, block_no long, n int, min_doc long, max_doc long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary, max_tf long, max_impact double"
)


def build_segments(
    postings: DataFrame,
    dstats: DataFrame | None,
    cstats: DataFrame,
    num_shards: int = 3,
    block_size: int = DEFAULT_BLOCK,
) -> DataFrame:
    """postings (term, doc_id, field, tf[, doclen]) → compressed block rows.

    avgdl/doclen are folded in at build time so each block row carries its own
    exact max_impact (tf_norm is monotone ↑ in tf and ↓ in doclen, but we take
    the max over the *actual* per-posting tf_norm — a tight bound).

    If postings already carry doclen (build_postings_fast), the doc-stats join
    is skipped entirely — the build is scan → analyze → ONE shuffle → encode.
    """
    if "doclen" in postings.columns:
        enriched = postings.join(F.broadcast(cstats), ["field"])
    else:
        enriched = postings.join(dstats, ["doc_id", "field"]).join(F.broadcast(cstats), ["field"])
    # chunk = doc range slice: bounds any (shard, term) group to ≤ CHUNK_SPAN
    # postings (head-term guard at any shard count) while keeping chunk doc
    # ranges disjoint and increasing, so block_no = chunk·bpc + local stays a
    # doc-ordered chain per (shard, term)
    blocks_per_chunk = 512
    chunk_span = block_size * blocks_per_chunk
    enriched = (
        enriched.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(num_shards)).cast("int"))
        .withColumn("chunk", (F.col("doc_id") / F.lit(chunk_span)).cast("long"))
        .select("shard", "term", "field", "chunk", "doc_id", "tf", "doclen", "avgdl")
    )

    # ONE exchange, map-side combined: partial collect_list packs each input
    # partition's postings for a (shard, term, field, chunk) group into arrays
    # BEFORE the shuffle, so the exchange moves array rows (≈ #groups), not
    # 10^8 scalar rows, and no cluster sort is needed at all — ordering happens
    # vectorized in numpy inside the encoder.
    grouped = (
        enriched.groupBy("shard", "term", "field", "chunk")
        .agg(
            F.collect_list(F.struct("doc_id", "tf", "doclen")).alias("pl"),
            F.first("avgdl").alias("avgdl"),
        )
        .select(
            "shard", "term", "field", "chunk", "avgdl",
            F.col("pl.doc_id").alias("docs"),
            F.col("pl.tf").alias("tfs"),
            F.col("pl.doclen").alias("dls"),
        )
    )

    def encode(batches: "Iterator") -> "Iterator":
        """Vectorized mapInArrow encoder over chunk-group rows (a group NEVER
        spans rows, so no carry buffering): read the list columns' value
        buffers directly (no per-row Python lists), numpy-sort within groups,
        derive block boundaries, run ONE varbyte pass per stream, and emit the
        per-block byte columns as Arrow BinaryArrays whose offsets index the
        ONE encoded buffer — blocks partition it contiguously, so no per-block
        bytes objects are ever materialized (the r7 rewrite: the previous
        mapInPandas form spent ~0.9 s/batch-set on list-of-struct conversion
        and O(#blocks) Python byte slicing)."""
        import pyarrow as pa
        # explicit: pyarrow does NOT auto-import its compute submodule, and a
        # fresh (e.g. memory-bounded) Python worker that has never touched the
        # pandas conversion path crashes on bare `pa.compute` (hit in the r7
        # 5M store build; unit/bench workers had it transitively imported)
        import pyarrow.compute  # noqa: F401

        # bound the working set per pass: a 10k-group Arrow batch can hold
        # tens of millions of postings at the 5M-doc scale; decode/encode in
        # row slices of ≤ ~2M postings so peak numpy memory per worker stays
        # ~50 MB regardless of batch geometry
        MAX_POSTINGS_PER_PASS = 2_000_000

        def slices(batch):
            lens_all = pa.compute.list_value_length(batch.column("docs")).to_numpy().astype(np.int64)
            start = 0
            acc = 0
            for i, ln in enumerate(lens_all):
                if acc and acc + ln > MAX_POSTINGS_PER_PASS:
                    yield batch.slice(start, i - start)
                    start, acc = i, 0
                acc += int(ln)
            if start < batch.num_rows:
                yield batch.slice(start, batch.num_rows - start)

        def gen_batches(it):
            for whole in it:
                if whole.num_rows == 0:
                    continue
                yield from slices(whole)

        for batch in gen_batches(batches):
            nrows = batch.num_rows
            if nrows == 0:
                continue
            docs_col = batch.column("docs")
            lens = pa.compute.list_value_length(docs_col).to_numpy().astype(np.int64)
            n = int(lens.sum())
            if n == 0:
                continue
            row_of = np.repeat(np.arange(nrows), lens)
            docs = docs_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            tfs = batch.column("tfs").flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            dls = batch.column("dls").flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((docs, row_of))  # doc-sort within each group
            docs, tfs, dls, row_of = docs[order], tfs[order], dls[order], row_of[order]
            avgdl = batch.column("avgdl").to_numpy(zero_copy_only=False)[row_of]
            impacts = tfs / (tfs + K1 * (1 - B + B * dls / avgdl))

            gstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos_in_group = np.arange(n) - np.repeat(gstarts, lens)
            block_in_group = pos_in_group // block_size
            blk_change = np.empty(n, dtype=bool)
            blk_change[0] = True
            blk_change[1:] = (row_of[1:] != row_of[:-1]) | (block_in_group[1:] != block_in_group[:-1])
            bstarts = np.flatnonzero(blk_change)
            bends = np.append(bstarts[1:], n)  # exclusive

            deltas = docs.copy()
            deltas[1:] -= docs[:-1]
            deltas[bstarts] = docs[bstarts]  # absolute restart → self-contained blocks
            dbuf, doffs = vb_encode_with_offsets(deltas.astype(np.uint64))
            tbuf, toffs = vb_encode_with_offsets(tfs.astype(np.uint64))
            lbuf, loffs = vb_encode_with_offsets(dls.astype(np.uint64))

            def bin_col(buf: np.ndarray, offs: np.ndarray) -> "pa.Array":
                # blocks cover [0, n) contiguously, so the per-block byte
                # ranges are one offsets array over the single encoded buffer
                edges = np.ascontiguousarray(offs[np.append(bstarts, n)], dtype=np.int32)
                return pa.Array.from_buffers(
                    pa.binary(), len(bstarts),
                    [None, pa.py_buffer(edges), pa.py_buffer(np.ascontiguousarray(buf, dtype=np.uint8))],
                )

            brow = row_of[bstarts]
            brow_pa = pa.array(brow)
            chunk = batch.column("chunk").to_numpy(zero_copy_only=False)[brow]
            yield pa.record_batch(
                [
                    batch.column("shard").take(brow_pa),
                    batch.column("term").take(brow_pa),
                    batch.column("field").take(brow_pa),
                    # long, NOT int32: block_no ~ doc_id / block_size, so an
                    # int32 silently wraps past doc_id ≈ 2.7e11 — inside the
                    # 10^12-doc posture ids.py targets — and a wrapped
                    # block_no re-orders the chain sort, corrupting the
                    # delta-decode (docs out of order, no error raised)
                    pa.array((chunk * blocks_per_chunk + block_in_group[bstarts]).astype(np.int64)),
                    pa.array((bends - bstarts).astype(np.int32)),
                    pa.array(docs[bstarts]),
                    pa.array(docs[bends - 1]),
                    bin_col(dbuf, doffs),
                    bin_col(tbuf, toffs),
                    bin_col(lbuf, loffs),
                    pa.array(np.maximum.reduceat(tfs, bstarts)),
                    pa.array(np.maximum.reduceat(impacts, bstarts)),
                ],
                names=["shard", "term", "field", "block_no", "n", "min_doc", "max_doc",
                       "doc_bytes", "tf_bytes", "dl_bytes", "max_tf", "max_impact"],
            )

    return grouped.mapInArrow(encode, schema=SEGMENT_COLS)


def decode_segment_rows(rows: pd.DataFrame) -> pd.DataFrame:
    """Inverse of build_segments for one (shard, term, field): block rows →
    (doc_id, tf, doclen) posting frame. Used by WAND and round-trip tests."""
    from ..functions.varbyte import decode_doc_ids_concat, vb_decode_concat

    rows = rows.sort_values("block_no")
    docs = decode_doc_ids_concat(list(rows["doc_bytes"]))[0]
    tfs = vb_decode_concat(list(rows["tf_bytes"]))[0]
    dls = vb_decode_concat(list(rows["dl_bytes"]))[0]
    return pd.DataFrame({"doc_id": docs.astype(np.int64), "tf": tfs.astype(np.int64), "doclen": dls.astype(np.int64)})
