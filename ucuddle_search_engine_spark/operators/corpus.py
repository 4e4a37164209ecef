"""Training-corpus preparation operators — the pipeline stages a 100 TB
LLM-data build runs between raw documents and training shards, beyond the
reference's search surface (which stops at indexing; SURVEY §2 'beyond the
reference' family, same tier as operators/dedup and functions/textstats):

- stratified_sample: deterministic hash-mod sampling per stratum (the
  language/source mix balancer). No RNG state, rerun-stable, SQL-replayable.
- unigram_logprob: mean per-token corpus log-probability — the cheap
  perplexity proxy used as a quality gate before expensive model scoring.
- pack_documents: concatenate-in-order-then-chunk shard assignment (sequence
  packing): each doc gets the pack where its first token lands under a fixed
  token budget per pack.
- ngram_overlap_flags: benchmark decontamination — flag documents sharing an
  n-gram (n≈8: the standard contamination shingle) with an eval/benchmark
  text set.

Scale posture: sampling and logprob are single groupBy/join plans (map-side
combined); packing uses the SAME two-phase distributed prefix sum as
operators/ids.assign_doc_ids_prefix (per-bucket totals → broadcast offsets →
bucket-local window), never a global single-partition window; decontamination
is a shingle-inverted semi-join (bucket-local, benchmark side is small and
broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_prefix_long
from ..functions.textstats import TOKEN_PATTERN, bpe_token_count

SAMPLE_MOD = 1_000_000


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", key_col: str = "doc_id") -> DataFrame:
    """Keep each row iff md5(key) mod 1e6 < fraction(stratum)·1e6 — the
    deterministic training-mix balancer (strata absent from `fractions` are
    dropped). Hash-mod, not rand(): rerun-stable, partitioning-independent,
    and exactly SQL-replayable."""
    bucket = F.pmod(md5_prefix_long(F.col(key_col).cast("string")), F.lit(SAMPLE_MOD))
    thresh = F.lit(0)
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum, F.lit(int(frac * SAMPLE_MOD))).otherwise(thresh)
    return df.filter(bucket < thresh)


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): mean ln(corpus unigram probability)
    per token — the perplexity-proxy quality score (low = rare/garbage
    vocabulary).

    Shuffle shape: the vocab join runs over the MAP-SIDE-COMBINED (doc, term,
    tf) table, not the raw token stream — a hot term ("the") contributes one
    row per document to the exchange, never one row per occurrence; the
    weighted mean Σ tf·ln(p) / Σ tf equals the per-token mean exactly."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), 0)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    uni = tf.groupBy("term").agg(F.sum("tf").alias("n"))
    total = uni.agg(F.sum("n").cast("double").alias("n_total"))
    return (
        tf.join(uni, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.log(F.col("n") / F.col("n_total"))) / F.sum("tf"), 6
            ).alias("avg_logprob"),
        )
    )


def pack_documents(docs: DataFrame, budget: int, id_col: str = "doc_id",
                   text_col: str = "text", bucket_size: int | None = None) -> DataFrame:
    """Sequence packing: documents are concatenated in id order and chunked
    into packs of `budget` tokens (BPE-piece proxy count); a document's
    pack_id is the pack where its first token lands. Equivalent to
    floor(exclusive-prefix-sum(n_tokens) / budget) over the id order.

    The prefix sum is two-phase (the assign_doc_ids_prefix pattern): ids are
    range-bucketed, per-bucket token totals come back to the driver (one tiny
    aggregate — n/bucket_size rows), and the within-bucket cumsum is a
    window PARTITIONED BY bucket — never a global single-partition window
    (the sort-id trap at 100 TB).

    bucket_size=None (default) auto-sizes so the driver holds ≤ ~4096 bucket
    totals regardless of corpus size; the pack_id result is bucket_size-
    INVARIANT (tested), so the knob is pure execution tuning."""
    if bucket_size is None:
        span = docs.agg(
            F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
        ).first()
        width = int(span["hi"] - span["lo"]) + 1 if span["hi"] is not None else 1
        bucket_size = max(1000, -(-width // 4096))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        bpe_token_count(text_col).alias("n_tokens"),
        # integer DIV, not `/`: Spark `/` on longs is DOUBLE, which loses
        # exactness above 2^53 — cumulative token counts at 100 TB get there
        F.expr(f"CAST({id_col} DIV {int(bucket_size)} AS LONG)").alias("_bkt"),
    )
    bkt_totals = {
        r["_bkt"]: r["s"]
        for r in base.groupBy("_bkt").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for b in sorted(bkt_totals):
        offsets[b] = acc
        acc += bkt_totals[b]
    spark = docs.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(sorted(offsets.items()), "_bkt long, _off long")
    )
    w = Window.partitionBy("_bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        base.join(off_df, "_bkt")
        .withColumn("_pre", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"CAST((_off + _pre) DIV {int(budget)} AS LONG)").alias("pack_id"),
        )
    )


def ngram_overlap_flags(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: (doc_id, n_shared) for every document that
    shares at least one n-token shingle with the benchmark set. The
    benchmark's distinct shingles are the small side (broadcastable); the
    join is shingle-bucket-local."""
    def _shingles(df, idc, tc):
        toks = F.regexp_extract_all(F.lower(tc), F.lit(TOKEN_PATTERN), 0)
        win = F.size(toks) - (n - 1)
        # sequence(1, 0) would DESCEND in Spark — guard short docs explicitly
        sh = F.when(win >= 1, F.transform(
            F.sequence(F.lit(1), F.greatest(win, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )).otherwise(F.array().cast("array<string>"))
        cols = ([F.col(idc).alias("doc_id")] if idc else [])
        return df.select(*cols, F.explode(F.array_distinct(sh)).alias("shingle"))

    bench_sh = F.broadcast(_shingles(benchmark, None, bench_text_col).distinct())
    doc_sh = _shingles(docs, id_col, text_col)
    return (
        doc_sh.join(bench_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
