"""The composed training-data pipeline — what a 100 TB corpus build actually
runs end-to-end, chaining the individually-oracle-checked stages:

    quality gate (lang + quality + token band, functions/textstats)
      → canonical-fingerprint dedup (keep lowest id)
      → stratified sampling (training mix, operators/corpus)
      → sequence packing (token-budget shards, operators/corpus)
      → shard-partitioned parquet write

Everything up to packing is ONE declarative plan (no intermediate
materialization — Catalyst fuses the filters and the dedup window into the
scan); packing adds the two-phase prefix sum (one tiny driver aggregate), and
the write partitions by pack_id so a training job reads shards by directory.

Scale posture: the only shuffles are the dedup groupBy(fingerprint), the
packing bucket exchange, and the final repartition("pack_id") — all keyed,
map-side combined, AQE-splittable. Nothing is collected beyond per-bucket
token totals (n/bucket_size rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textstats import text_stats
from ..operators.corpus import pack_documents, stratified_sample


def build_training_shards(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    fractions: dict[str, float],
    budget: int = 2048,
    min_quality: float = 0.6,
    token_band: tuple[int, int] = (20, 10000),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """documents (doc_id, text, lang, ...) → pack-partitioned shard dataset
    under out_dir. Returns {n_in, n_kept, n_packs}. `fractions` keys are the
    PREDICTED language (textstats.lang_id over the vote alphabet), so the gate
    and the mix use the same detector the routed indexes use."""
    stats = text_stats(documents, id_col=id_col, text_col=text_col)
    keep = stats.filter(
        (F.col("quality") >= min_quality)
        & F.col("n_tokens").between(*token_band)
        & F.col("lang_pred").isin(list(fractions))
    )
    # canonical-fingerprint dedup, keep the lowest id of each cluster —
    # CARRYING lang_pred through the aggregate (min_by pins it to the kept
    # row; cluster members share identical text, hence identical
    # prediction): re-joining `stats` for lang_pred afterwards put the
    # whole tokenize+quality+fingerprint subtree in the plan TWICE, and
    # Catalyst does not dedup common subplans across joins — the dominant
    # full-corpus scan ran twice
    canon = keep.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang_pred", "doc_id").alias("lang_pred"),
    )
    # training mix over the PREDICTED language
    gated = documents.select(F.col(id_col).alias("doc_id"), text_col, "lang").join(
        canon.select("doc_id", "lang_pred"), "doc_id"
    )
    mixed = stratified_sample(gated, fractions, strata_col="lang_pred")

    packed = pack_documents(mixed, budget=budget, id_col="doc_id", text_col=text_col)
    shards = mixed.join(packed.select("doc_id", "n_tokens", "pack_id"), "doc_id")
    (
        shards.repartition("pack_id")
        .write.mode("overwrite")
        .partitionBy("pack_id")
        .parquet(os.path.join(out_dir, "shards"))
    )
    out = spark.read.parquet(os.path.join(out_dir, "shards"))
    return {
        "n_in": documents.count(),
        "n_kept": out.count(),
        "n_packs": out.select("pack_id").distinct().count(),
    }
