"""Connected components over near-duplicate pairs → dedup clusters.

Pair finders (MinHash-LSH, SimHash bands, embedding LSH) emit EDGES; an
actual dedup pipeline must then group transitively-connected docs into one
cluster and keep a canonical representative. This is iterative min-label
propagation expressed as DataFrame joins — the same driver-loop +
localCheckpoint pattern as operators/pagerank (the other non-SQL-expressible
iterative op; its machine-checkable oracle is a DuckDB RECURSIVE CTE, see
__spark_entry__._components_sql).

Scale posture: each iteration is one join edges⋈labels (shuffle on node id,
map-side-combined min) + one label update; lineage is cut per iteration with
localCheckpoint, convergence checked by a count of changed labels. Min-label
propagation converges in O(component diameter) rounds — near-dup clusters
are dense and shallow (diameter ≤ ~4), which is why dedup pipelines use
exactly this loop; for adversarial long-chain graphs switch to the
large-star/small-star variant (same join shapes, O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b",
                         max_iter: int = 25, algorithm: str = "auto") -> DataFrame:
    """(src, dst) undirected edges → (doc_id, component) for every endpoint,
    component = min doc id reachable. Deterministic.

    algorithm:
      'minlabel' — min-label propagation, O(diameter) rounds: the right loop
        for dedup clusters (dense, diameter ≤ ~4); raises if unconverged.
      'star' — large-star/small-star (Kiveris et al., CC-in-MapReduce),
        O(log n) rounds regardless of diameter: the adversarial-graph path.
      'auto' (default) — minlabel, falling back to star instead of raising
        when a long-chain component exceeds max_iter rounds.
    """
    if algorithm == "star":
        return connected_components_star(edges, src, dst)
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = fwd.unionByName(fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    labels = (
        und.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    changed = None
    for _ in range(max_iter):
        nbr = (
            und.join(labels, und["s"] == labels["doc_id"])
            .groupBy(F.col("d").alias("doc_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_chg"),
            )
        )
        updated = updated.localCheckpoint()  # cut lineage, materialize once
        changed = updated.filter(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    if changed:
        if algorithm == "auto":
            # a component with diameter > max_iter: switch to the O(log n)
            # variant rather than burning O(diameter) more rounds
            return connected_components_star(edges, src, dst)
        # never return silently-wrong clusters
        raise RuntimeError(f"connected_components: not converged after {max_iter} rounds")
    return labels


def connected_components_star(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b",
                              max_iter: int = 50) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al. 2014):
    alternate two edge rewrites until fixpoint — large-star hangs every
    bigger-id neighbor of u under min(Γ(u) ∪ {u}); small-star re-hangs the
    smaller-id neighbors. Converges in O(log n) rounds for ANY diameter, so
    this is the path for adversarial long-chain graphs where min-label
    propagation would need O(diameter) rounds.

    Each round is two groupBy-join pairs on node id (map-side-combined mins),
    lineage cut per round; at fixpoint every component is a star centered at
    its min node, read off directly as (doc_id, component)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("u").alias("doc_id"))
        .unionByName(e.select(F.col("v").alias("doc_id")))
        .distinct()
        .localCheckpoint()
    )

    def large_star(ed: DataFrame) -> DataFrame:
        und = ed.unionByName(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = und.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", F.col("u")).alias("m")
        )
        return (
            und.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        o = ed.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        nb = o.join(m, "u")
        return (
            nb.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iter):
        nxt = small_star(large_star(e)).localCheckpoint()
        if nxt.exceptAll(e).count() == 0 and e.exceptAll(nxt).count() == 0:
            e = nxt
            break
        e = nxt
    else:
        raise RuntimeError(f"connected_components_star: no fixpoint after {max_iter} rounds")
    # fixpoint = stars: every non-center points at its component min
    return nodes.join(
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("_c")), "doc_id", "left"
    ).select("doc_id", F.coalesce("_c", F.col("doc_id")).alias("component"))


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full dedup: near-dup pairs → components → keep the min-id doc of each
    cluster (plus every unpaired doc). Returns the deduplicated df."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return df.join(losers, df[id_col] == losers["doc_id"], "left_anti")
