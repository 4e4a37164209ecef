"""Iterative PageRank document prior + ranking blend.

The reference captures exactly this data — per-page outgoing hyperlinks
(extraction + URL normalization at crawler/main.go:176-192, stored at
crawler/main.go:241-244) and a reserved `Site.PageRank` field
(crawler/structures.go:14) with dedicated fixtures
(files/page_rank_test_domains.json, files/PG_test2.json) — but computes the
rank outside the repo. We implement it as the Pregel-style DataFrame loop
(SURVEY.md §4.3 custom #5):

    contribs = ranks ⋈ edges on src  →  groupBy(dst).sum(rank/out_deg)
    rank'    = (1-d)/N + d·(contribs + dangling_mass/N)

- damping d = 0.85, dangling mass redistributed uniformly (Σrank ≡ 1);
- localCheckpoint() every iteration cuts the lineage chain (without it the
  plan doubles per iteration and the driver OOMs long before 100 TB);
- skew: hub pages (many in-links) are handled by the partial aggregation of
  groupBy(dst).sum — map-side combine collapses per-partition contributions
  before the shuffle, so a hub receives ≤ P pre-aggregated rows.

Blend (north_star "modified-PageRank ranking blend"):
    final = bm25 · (alpha + beta · pagerank / max_pagerank)
monotone in bm25 for fixed doc → WAND candidates at k'=4k then re-rank stays
exact for the blend (tests/test_pagerank.py::test_blend_rerank_sufficiency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def extract_links(docs: DataFrame) -> DataFrame:
    """Edges (src_doc_id, dst_doc_id) from `ref://repo/path-stem` tokens in
    content — the code-corpus analogue of hyperlink extraction + normalization
    (crawler/main.go:176-192): absolute refs only, dedup into a set.

    Join is on the path *stem* (path minus extension) so refs are
    extension-agnostic, mirroring the reference's strip-query-string
    normalization (crawler/main.go:180-188).
    """
    refs = docs.select(
        F.col("doc_id").alias("src_doc_id"),
        F.explode(F.regexp_extract_all(F.col("content"), F.lit(r"ref://([\w./-]+)"), 1)).alias("ref"),
    ).dropDuplicates()  # F2/F3 dedup semantics
    targets = docs.select(
        F.col("doc_id").alias("dst_doc_id"),
        F.concat_ws("/", F.col("repo"), F.regexp_replace(F.col("path"), r"\.[a-z]+$", "")).alias("ref"),
    )
    return (
        refs.join(targets, "ref")
        .filter(F.col("src_doc_id") != F.col("dst_doc_id"))
        .select("src_doc_id", "dst_doc_id")
        .dropDuplicates()
    )


def pagerank(
    edges: DataFrame,
    all_ids: DataFrame,
    iterations: int = 20,
    damping: float = DAMPING,
    tol: float | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """edges(src_doc_id, dst_doc_id) + all_ids(doc_id) → (doc_id, pagerank).

    Fixed-iteration by default (deterministic output for tests); pass tol for
    L1-convergence early exit. Σpagerank = 1 within 1e-9 every iteration.
    """
    import os

    spark = edges.sparkSession
    n = all_ids.count()
    if n == 0:
        return all_ids.withColumn("pagerank", F.lit(0.0))

    # out_deg persisted too: the per-iteration dangling-mass aggregate joins
    # against it, and without the persist each iteration re-ran the WHOLE
    # upstream edge plan (scan + dropDuplicates shuffle) just to rebuild the
    # degree table (r7 fix — ed alone being persisted did not cover it)
    out_deg = edges.groupBy("src_doc_id").agg(F.count("*").alias("out_deg")).persist()
    # edges with the source's out-degree attached; reused every iteration
    ed = edges.join(out_deg, "src_doc_id").select("src_doc_id", "dst_doc_id", "out_deg").persist()
    ed.count()

    # Join strategy (opt guide §3.1), decided from n, which we just counted:
    # `ranks` is a localCheckpoint each iteration, so Catalyst has NO size
    # statistics for it and silently falls back to shuffling BOTH sides of
    # every per-iteration join (measured r7: Exchange of the edge table ×5).
    # One rank row is ~16 bytes; when the whole rank vector fits comfortably
    # in a broadcast (n ≤ UCUDDLE_PR_BROADCAST_MAX_NODES, default 2e6 ≈ 32 MB)
    # broadcast it and leave the persisted edge table un-shuffled. Past that
    # size the shuffle path is the correct plan and remains the default.
    bcast_ranks = n <= int(os.environ.get("UCUDDLE_PR_BROADCAST_MAX_NODES", "2000000") or 0)

    def _b(df):
        return F.broadcast(df) if bcast_ranks else df

    # Checkpoint cadence: per-iteration localCheckpoint stays the right shape
    # in BOTH regimes (examined r7, batching rejected by measurement): without
    # the eager checkpoint each un-checkpointed iteration re-plans and
    # re-executes the growing broadcast chain — the 5-iteration bench
    # REGRESSED 2.4 s → 9.5 s when K iterations were batched per checkpoint,
    # because the dangling anti-join's streamed `ranks` side and each
    # broadcast build re-traverse the whole uncheckpointed lineage (AQE
    # re-plans every nested subquery; exchange reuse does not span them).

    ranks = all_ids.select(F.col("doc_id"), F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            _b(ranks).join(ed, ranks.doc_id == ed.src_doc_id)
            .select(F.col("dst_doc_id").alias("doc_id"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("doc_id")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass = rank held by docs with no out-edges; kept INSIDE the
        # plan as a broadcast 1-row aggregate so each iteration is one job
        dangling = F.broadcast(
            ranks.join(_b(out_deg), ranks.doc_id == out_deg.src_doc_id, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        new_ranks = (
            all_ids.join(_b(contribs), "doc_id", "left")
            .crossJoin(dangling)
            .select(
                "doc_id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dangling") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol is not None:
            diff = (
                ranks.join(new_ranks.withColumnRenamed("rank", "nr"), "doc_id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("nr"))))
                .first()[0]
            )
            ranks = new_ranks
            if diff < tol:
                break
        else:
            ranks = new_ranks
    ed.unpersist()
    out_deg.unpersist()
    return ranks.withColumnRenamed("rank", "pagerank")


def blend_scores(topk: DataFrame, ranks: DataFrame, alpha: float = 1.0, beta: float = 1.0) -> DataFrame:
    """final = bm25 · (alpha + beta·pr_norm) over a candidate DataFrame."""
    max_pr = ranks.agg(F.max("pagerank")).first()[0] or 1.0
    return (
        topk.join(ranks, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("score")
                * (F.lit(alpha) + F.lit(beta) * F.coalesce(F.col("pagerank"), F.lit(0.0)) / F.lit(max_pr))
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )


def blend_topk_exact(
    search_fn,
    ranks: DataFrame,
    k: int = 10,
    alpha: float = 1.0,
    beta: float = 1.0,
    k0_factor: int = 4,
    max_candidates: int = 100_000,
) -> list[tuple[int, float]]:
    """Provably-exact top-k of the blended score from bm25 top-k' candidates.

    The blend multiplier lies in [alpha, alpha+beta] (pr_norm ∈ [0,1]), so any
    doc outside the bm25 top-k' is bounded by bm25_{k'+1}·(alpha+beta). Start
    at k' = k0_factor·k and double until the k-th blended candidate beats that
    bound — the WAND-upper-bound folding discipline from SURVEY.md §7.3 (the
    prior must be monotone-folded or re-ranked on a *sufficient* candidate
    set; this implements and certifies the latter).

    search_fn(k) -> DataFrame (doc_id, score) ordered by bm25. Driver-side
    data stays O(k') rows.
    """
    max_pr = ranks.agg(F.max("pagerank")).first()[0] or 1.0
    k_prime = max(k, k0_factor * k)
    while True:
        cand = search_fn(k_prime + 1).collect()
        exhausted = len(cand) <= k_prime
        rows = cand[:k_prime]
        ids = [r["doc_id"] for r in rows]
        pr = {
            r["doc_id"]: r["pagerank"]
            for r in ranks.filter(F.col("doc_id").isin(ids)).collect()
        }
        blended = sorted(
            ((r["doc_id"], r["score"] * (alpha + beta * pr.get(r["doc_id"], 0.0) / max_pr)) for r in rows),
            key=lambda x: (-x[1], x[0]),
        )
        if exhausted:
            return blended[:k]
        bound = cand[k_prime]["score"] * (alpha + beta)
        if len(blended) >= k and blended[k - 1][1] >= bound:
            return blended[:k]
        if k_prime >= max_candidates:
            return blended[:k]  # bail-out cap for adversarial score plateaus
        k_prime *= 2
