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
                         max_iter: int = 25) -> DataFrame:
    """(src, dst) undirected edges → (doc_id, component) for every endpoint,
    component = min doc id reachable. Deterministic."""
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
        # never return silently-wrong clusters: a component with diameter >
        # max_iter did not converge — the caller should raise max_iter or
        # switch to the large-star/small-star O(log n) variant
        raise RuntimeError(f"connected_components: not converged after {max_iter} rounds")
    return labels


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full dedup: near-dup pairs → components → keep the min-id doc of each
    cluster (plus every unpaired doc). Returns the deduplicated df."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return df.join(losers, df[id_col] == losers["doc_id"], "left_anti")
