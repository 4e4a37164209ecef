"""Approximate-nearest-neighbor similarity search over an embedding column.

Two paths (training-data-pipeline requirement):
- brute-force cosine top-k — the exact baseline, pure JVM column ops
  (zip_with dot product + aggregate), TakeOrderedAndProject for the top-k;
- hyperplane-LSH bucketed top-k — the 100 TB path: deterministic random
  hyperplanes (seed=42) assign every vector a sign-bit bucket; a query probes
  its own bucket plus all 1-bit-flip neighbors (multiprobe), so the scan
  touches ~ (n_planes+1)/2^n_planes of the corpus. Recall vs brute force is
  asserted in tests/test_ann_dedup.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_topk_bruteforce(emb: DataFrame, query_vec: list[float], k: int = 10,
                           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine(query, v), tie-break id asc. The query vector is a
    literal array → no join, single scan, whole-stage codegen."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    # Round BEFORE orderBy/limit: ties at the k boundary then break by vec_id
    # exactly like a rounded-score SQL oracle (ulp-robust cut).
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.RandomState(SEED)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Sign-bit bucket id from deterministic hyperplanes, as a Column."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def cosine_topk_lsh(emb: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Bucketed ANN: score only vectors in the query's bucket or a 1-bit
    neighbor. The bucket filter prunes the scan before any dot product."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, qv)) > 0)
    probe = [qbucket] + [qbucket ^ (1 << i) for i in range(n_planes)]
    bucketed = emb.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    return cosine_topk_bruteforce(
        bucketed.filter(F.col("_bucket").isin(probe)), query_vec, k=k, id_col=id_col, vec_col=vec_col
    )
