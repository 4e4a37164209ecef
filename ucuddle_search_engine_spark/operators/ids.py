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
    """Scale path: per-range-bucket offsets instead of a global sort.

    Range boundaries are sampled ONCE on the driver (a bounded collect of
    ~100 keys per bucket) and turned into a per-ROW deterministic bucket id
    `_pid` (count of boundaries <= key), so the counts job and the
    id-assignment job agree on every row's bucket no matter how either job is
    physically partitioned. The previous implementation derived `_pid` from
    spark_partition_id() after repartitionByRange and recomputed the plan per
    action; repartitionByRange re-SAMPLES its boundaries with a seed derived
    from the RDD id, which differs across actions (verified empirically on
    PySpark 4.1.2), so the two jobs could disagree on the layout and produce
    duplicate/skipped ids. Bucket id from data, not from layout, removes that
    hazard with no corpus-sized persist.

    (bucket exclusive-prefix-sum) + (within-bucket rank) = global dense rank,
    because buckets are non-overlapping increasing key ranges.
    """
    import pandas as pd

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    key_df = df.select(*order_cols)
    n_rows = key_df.count()
    boundaries: list[tuple] = []
    if n_rows > 0 and num_partitions > 1:
        frac = min(1.0, (100.0 * num_partitions) / n_rows)
        sampled = sorted(
            tuple(r) for r in key_df.sample(withReplacement=False, fraction=frac, seed=42).collect()
        )
        if sampled:
            step = len(sampled) / num_partitions
            seen_b = set()
            for i in range(1, num_partitions):
                b = sampled[min(int(i * step), len(sampled) - 1)]
                if b not in seen_b:  # duplicate boundaries would only make empty buckets
                    seen_b.add(b)
                    boundaries.append(b)

    key = F.struct(*[F.col(c).alias(f"k{i}") for i, c in enumerate(order_cols)])
    pid = F.lit(0)
    for b in boundaries:
        bnd = F.struct(*[F.lit(v).alias(f"k{i}") for i, v in enumerate(b)])
        pid = pid + (key >= bnd).cast("int")
    parted = (
        df.withColumn("_pid", pid)
        .repartition(num_partitions, "_pid")
        .sortWithinPartitions("_pid", *order_cols)
    )
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    boffsets = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in parted.schema.fields) + ", doc_id long"

    def add_ids(batches) -> "pd.DataFrame":
        # rows arrive sorted by (_pid, key); a bucket lives entirely in one
        # task (hash on _pid), so per-bucket running counters across Arrow
        # batches yield the bucket-local rank — no 2nd shuffle. A task may own
        # several buckets (hash collisions), so track counters per bucket.
        seen: dict[int, int] = {}
        offs = boffsets.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bs = pdf["_pid"].to_numpy()
            local = pd.Series(bs).groupby(bs).cumcount().to_numpy()
            base = pd.Series(bs).map(lambda b: offs.get(int(b), 0) + seen.get(int(b), 0)).to_numpy()
            pdf = pdf.copy()
            pdf["doc_id"] = base + local
            for b, c in pd.Series(bs).value_counts().items():
                seen[int(b)] = seen.get(int(b), 0) + int(c)
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema).drop("_pid")
