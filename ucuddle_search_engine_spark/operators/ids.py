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
    parted = df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(*order_cols)
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    counts = {r["_pid"]: r["cnt"] for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boffsets = df.sparkSession.sparkContext.broadcast(offsets)

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in with_pid.schema.fields) + ", doc_id long"

    def add_ids(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pdf.assign(doc_id=pd.Series([], dtype="int64"))
        pid = int(pdf["_pid"].iloc[0])
        base = boffsets.value.get(pid, 0)
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        pdf["doc_id"] = base + pdf.index
        return pdf

    # group by partition id: each group is exactly one range partition
    return with_pid.groupBy("_pid").applyInPandas(add_ids, schema=out_schema).drop("_pid")
