"""Deterministic distributed doc-id assignment.

The reference allocates monotone site_ids in blocks from a central task-manager
counter guarded by a mutex (task-manager/app.py:102-116, per-doc assignment
crawler/functs_with_elastic.go:303-309) — a central bottleneck at 10^12 files.
We replace it (SURVEY.md §4.3 custom #4) with deterministic assignment keyed
only on the data:

- ``assign_doc_ids_sort``: dense row_number over a global order — exact, used
  at test scale and as the oracle for the scale path.
- ``assign_doc_ids_prefix``: the 10^12-scale path. Range-partition by the key,
  sort within partitions, count per partition (a tiny collect: one long per
  partition), exclusive prefix-sum on the driver, then offset + local index
  via one mapPartitions-style pandas pass. No global sort, no single-point
  counter; the only driver data is O(#partitions).

Both produce the identical id ↔ (repo, path) mapping (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids_hash(df: DataFrame, key_cols: list[str], num_buckets: int = 4096,
                        num_partitions: int | None = None) -> DataFrame:
    """Cheapest deterministic scheme: ids are dense within md5-hash buckets.

    - bucket = pmod(md5-prefix(key), B) — portable, layout-independent;
    - bucket counts from a COLUMN-PRUNED scan of the keys only (collect of ≤B
      longs), exclusive prefix-sum on the driver;
    - one shuffle co-locating each bucket, keys sorted within it, id =
      offset[bucket] + rank-in-bucket via a running per-bucket counter across
      Arrow batches (no second shuffle, no carry buffer).

    Ids are unique, stable across runs/partitionings/cluster sizes, but NOT the
    global lexicographic rank (use assign_doc_ids_prefix for that)."""
    import pandas as pd

    from ..functions.hashing import md5_prefix_long

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    bucket = F.pmod(md5_prefix_long(F.concat_ws("\x00", *key_cols)), F.lit(num_buckets)).cast("int")
    counts = {
        r["_b"]: r["cnt"]
        for r in df.select(bucket.alias("_b")).groupBy("_b").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    boffsets = df.sparkSession.sparkContext.broadcast(offsets)

    parted = (
        df.withColumn("_b", bucket)
        .repartition(num_partitions, "_b")
        .sortWithinPartitions("_b", *key_cols)
    )
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in parted.schema.fields) + ", doc_id long"

    def add_ids(batches):
        seen: dict[int, int] = {}
        offs = boffsets.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bs = pdf["_b"].to_numpy()
            local = pd.Series(bs).groupby(bs).cumcount().to_numpy()
            base = pd.Series(bs).map(lambda b: offs.get(int(b), 0) + seen.get(int(b), 0)).to_numpy()
            pdf = pdf.copy()
            pdf["doc_id"] = base + local
            for b, c in pd.Series(bs).value_counts().items():
                seen[int(b)] = seen.get(int(b), 0) + int(c)
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema).drop("_b")


def assign_doc_ids_sort(df: DataFrame, order_cols: list[str]) -> DataFrame:
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("doc_id", F.row_number().over(w).cast("long") - F.lit(1).cast("long"))


def assign_doc_ids_prefix(df: DataFrame, order_cols: list[str], num_partitions: int | None = None) -> DataFrame:
    """Scale path: per-partition offsets instead of a global sort.

    repartitionByRange gives non-overlapping key ranges per partition, so
    (partition exclusive-prefix-sum) + (within-partition rank) is exactly the
    global dense rank.
    """
    import pandas as pd

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    # NO persist: caching `parted` pins a corpus-sized copy (every column,
    # including content) for the session — the old persist was never
    # released and at the 100 TB posture would spill the whole corpus. The
    # counts job below scans with column pruning (order_cols only), and the
    # final job recomputes the plan — consistent because the whole chain is
    # deterministic (range-partitioner sampling is fixed-seeded, order_cols
    # are a unique key), the same purity the resumable build already relies
    # on to recompute this pass across runs.
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boffsets = df.sparkSession.sparkContext.broadcast(offsets)

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in parted.schema.fields) + ", doc_id long"

    def add_ids(batches) -> "pd.DataFrame":
        # one call per partition; rows arrive pre-sorted, so a running offset
        # across Arrow batches yields the partition-local rank — no 2nd shuffle
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = boffsets.value.get(int(pdf["_pid"].iloc[0]), 0)
            pdf = pdf.copy()
            pdf["doc_id"] = base + seen + pd.RangeIndex(len(pdf))
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema).drop("_pid")
