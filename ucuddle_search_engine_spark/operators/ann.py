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

import math

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


def _probe_buckets(planes: np.ndarray, query_vec) -> list[int]:
    """Query bucket + all 1-bit-flip neighbors (multiprobe) — driver-side
    n_planes dot products, independent of corpus size."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, qv)) > 0)
    return [qbucket] + [qbucket ^ (1 << i) for i in range(len(planes))]


def cosine_topk_lsh(emb: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Bucketed ANN over an UNINDEXED table: score only vectors in the
    query's bucket or a 1-bit neighbor. The bucket filter prunes before any
    query dot product, but the signature itself is recomputed per query —
    use LSHIndex (write once, probe = directory pruning) for a served
    corpus; this form is the one-shot/oracle path."""
    planes = _planes(len(query_vec), n_planes)
    probe = _probe_buckets(planes, query_vec)
    bucketed = emb.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    return cosine_topk_bruteforce(
        bucketed.filter(F.col("_bucket").isin(probe)), query_vec, k=k, id_col=id_col, vec_col=vec_col
    )


class LSHIndex:
    """PERSISTED hyperplane-LSH ANN index — the IVFIndex pattern applied to
    the sign-bit buckets: the signature is computed ONCE at build, vectors
    are written partitioned by `_bucket`, and a query's multiprobe list
    becomes DIRECTORY pruning (PartitionFilters on _bucket, plan-asserted in
    tests/test_ann_dedup.py). Same planes (seed=42), same probe list, same
    scoring as cosine_topk_lsh — rank-identical results, but a query reads
    ~(n_planes+1)/2^n_planes of the corpus instead of projecting all of it
    through n_planes dot products first."""

    def __init__(self, emb: DataFrame, dim: int, n_planes: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 _assigned: DataFrame | None = None):
        self.n_planes = n_planes
        self.dim = dim
        self.id_col = id_col
        self.vec_col = vec_col
        self.planes = _planes(dim, n_planes)
        if _assigned is not None:
            self.assigned = _assigned  # loaded store: _bucket already materialized
        else:
            self.assigned = emb.withColumn(
                "_bucket", lsh_bucket_col(F.col(vec_col), self.planes))

    def topk(self, query_vec: list[float], k: int = 10) -> DataFrame:
        probe = _probe_buckets(self.planes, query_vec)
        pruned = self.assigned.filter(F.col("_bucket").isin(probe))
        return cosine_topk_bruteforce(pruned, list(query_vec), k=k,
                                      id_col=self.id_col, vec_col=self.vec_col)

    def write(self, path: str) -> None:
        import json
        import os

        self.assigned.repartition("_bucket").write.mode("overwrite") \
            .partitionBy("_bucket").parquet(os.path.join(path, "buckets"))
        with open(os.path.join(path, "lsh.json"), "w") as f:
            json.dump({"n_planes": self.n_planes, "dim": self.dim,
                       "id_col": self.id_col, "vec_col": self.vec_col}, f)

    @classmethod
    def load(cls, spark, path: str) -> "LSHIndex":
        import json
        import os

        with open(os.path.join(path, "lsh.json")) as f:
            meta = json.load(f)
        assigned = spark.read.parquet(os.path.join(path, "buckets"))
        return cls(None, dim=meta["dim"], n_planes=meta["n_planes"],
                   id_col=meta["id_col"], vec_col=meta["vec_col"],
                   _assigned=assigned)


class IVFIndex:
    """Inverted-file ANN over an embedding column — the other standard scale
    path next to hyperplane LSH: k-means centroids partition the corpus into
    cells; a query scores only the n_probe nearest cells.

    - TRAIN: deterministic hash-sampled subset (pmod(xxhash64(id), rate)==0)
      collected to the driver, spherical k-means (Lloyd, seeded numpy) — the
      standard sampled-training shortcut every IVF build uses; sample size is
      bounded and independent of corpus size.
    - ASSIGN: one Arrow-batched pandas UDF (numpy matmul per batch) adds a
      `_cell` column; persist/write the assigned table partitioned by _cell
      and the probe filter becomes directory pruning, exactly like the `tb`
      term buckets of the text index.
    - QUERY: centroid dots in the driver (n_centroids rows), then brute-force
      cosine over the probed cells only — scan ≈ n_probe/n_centroids of the
      corpus.
    """

    # ceiling on the driver-side k-means training collect (vectors): the
    # hash-sample rate bounds the EXPECTED sample size, and a .limit() after
    # the sample is the hard cutoff; in effect regardless of the caller's
    # sample_rate
    TRAIN_CAP = 100_000
    # n_probe="auto" (the default): probe at least this fraction of cells,
    # then keep growing while the next centroid is within AUTO_MARGIN cosine
    # of the best one (a near-tie centroid is as likely to hold neighbors).
    # A fixed tiny n_probe on unstructured (isotropic) data silently returns
    # ~30% recall (BENCH/recall.json r5); the floor keeps the default
    # operating point ≥ ~0.7 recall@10 at ≤ 25% scan on that worst case,
    # while clustered data (big sim gaps) stays at the fraction floor.
    AUTO_SCAN_FRACTION = 0.25
    AUTO_MARGIN = 0.02

    def __init__(self, emb: DataFrame, n_centroids: "int | None" = None,
                 n_probe: "int | str" = "auto",
                 sample_rate: int = 1, train_iters: int = 8,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 centroids: "np.ndarray | None" = None):
        self.n_probe = n_probe
        self.id_col = id_col
        self.vec_col = vec_col
        if centroids is not None:
            # Pre-trained quantizer (the FAISS pattern): centroids are index
            # PARAMETERS — train once on a bounded sample, ship the matrix.
            # This is also what makes the IVF pipeline SQL-oracle-replayable.
            self.centroids = np.asarray(centroids, dtype=np.float64)
        else:
            # the driver-side k-means collect is UNCONDITIONALLY bounded: a
            # caller-provided sample_rate > 1 is trusted for the EXPECTED
            # size (no extra corpus pass to count); otherwise one count sizes
            # the hash-sample rate so the expected sample is <= TRAIN_CAP.
            # Either way a .limit(TRAIN_CAP) after the sample is the hard
            # cutoff — an IVFIndex(emb) on a 100 TB corpus never collects
            # the corpus, and a skewed hash can't overshoot the cap
            n = None
            if sample_rate > 1:
                rate = sample_rate
            else:
                n = emb.count()
                rate = max(1, -(-n // self.TRAIN_CAP))
            if n_centroids is None:
                # quantization-granularity default, 4·√n clamped: the fixed
                # coarse default (16 cells) pinned recall to what 2-of-16
                # probing can see — 0.45@25% scan on isotropic vectors
                # (BENCH/recall.json r5). Finer cells raise neighbors-per-
                # scanned-vector at ANY scan fraction; 4√n (the FAISS
                # sizing guideline's fine end) measured 0.70-0.79 recall@10
                # at the same 25% scan floor. n//8 keeps ≥8 vectors/cell so
                # tiny corpora don't degenerate to one-point cells.
                if n is None:
                    n = emb.count()
                n_centroids = int(min(max(16, 4 * math.isqrt(n)), max(16, n // 8), 65536))
            sampled = emb.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(rate)) == 0) \
                if rate > 1 else emb
            # deterministic hard cutoff: when the sample overshoots TRAIN_CAP
            # (caller-trusted rate, skewed hash), a bare .limit() would keep
            # partition-order-dependent rows and the centroids would drift
            # across runs/cluster layouts; ordering by (hash, id) makes the
            # kept set a pure function of the data (TakeOrderedAndProject —
            # a bounded top-k, never a full sort shuffle)
            train = np.array([
                r[0] for r in sampled.select(
                    vec_col, F.xxhash64(F.col(id_col)).alias("_h"), F.col(id_col).alias("_i")
                ).orderBy("_h", "_i").limit(self.TRAIN_CAP).collect()
            ], dtype=np.float64)
            self.train_size_ = len(train)
            train /= np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-12)
            rng = np.random.RandomState(SEED)
            cents = train[rng.choice(len(train), size=min(n_centroids, len(train)), replace=False)]
            for _ in range(train_iters):
                assign = np.argmax(train @ cents.T, axis=1)
                for c in range(len(cents)):
                    m = train[assign == c]
                    if len(m):
                        v = m.mean(axis=0)
                        cents[c] = v / max(np.linalg.norm(v), 1e-12)
            self.centroids = cents

        cents_b = emb.sparkSession.sparkContext.broadcast(self.centroids)

        import pandas as pd
        from pyspark.sql import types as T

        def _cells(vs):
            mat = np.array([np.asarray(v, dtype=np.float64) for v in vs])
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(mat @ cents_b.value.T, axis=1).astype(np.int32), index=vs.index)

        cell_udf = F.pandas_udf(_cells, T.IntegerType())
        self.assigned = emb.withColumn("_cell", cell_udf(F.col(vec_col)))

    def _probe_cells(self, qn: np.ndarray) -> list[int]:
        """Probed cell ids for a (normalized) query — fixed n_probe, or the
        auto rule: ceil(AUTO_SCAN_FRACTION · cells) floor, grown while the
        next centroid sits within AUTO_MARGIN of the best (driver-side
        n_centroids dot products, independent of corpus size)."""
        sims = self.centroids @ qn
        order = np.argsort(-sims)
        if self.n_probe == "auto":
            n = max(1, int(np.ceil(len(order) * self.AUTO_SCAN_FRACTION)))
            cut = float(sims[order[0]]) - self.AUTO_MARGIN
            while n < len(order) and float(sims[order[n]]) >= cut:
                n += 1
        else:
            n = int(self.n_probe)
        return [int(c) for c in order[:n]]

    def topk(self, query_vec: list[float], k: int = 10) -> DataFrame:
        qv = np.asarray(query_vec, dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        probes = self._probe_cells(qn)
        pruned = self.assigned.filter(F.col("_cell").isin(probes))
        return cosine_topk_bruteforce(pruned, list(query_vec), k=k,
                                      id_col=self.id_col, vec_col=self.vec_col)

    def write(self, path: str) -> None:
        """Persist as an on-disk index: vectors partitioned by _cell (a probe
        becomes DIRECTORY pruning — the `tb` term-bucket trick for vectors)
        plus the centroid matrix. Assignment cost is paid once at build."""
        import json
        import os

        self.assigned.repartition("_cell").write.mode("overwrite").partitionBy("_cell").parquet(
            os.path.join(path, "cells")
        )
        with open(os.path.join(path, "centroids.json"), "w") as f:
            json.dump({"centroids": self.centroids.tolist(), "n_probe": self.n_probe,
                       "id_col": self.id_col, "vec_col": self.vec_col}, f)

    @classmethod
    def load(cls, spark, path: str) -> "IVFIndex":
        import json
        import os

        with open(os.path.join(path, "centroids.json")) as f:
            meta = json.load(f)
        obj = cls.__new__(cls)
        obj.centroids = np.asarray(meta["centroids"], dtype=np.float64)
        obj.n_probe = meta["n_probe"]
        obj.id_col = meta["id_col"]
        obj.vec_col = meta["vec_col"]
        obj.assigned = spark.read.parquet(os.path.join(path, "cells"))
        return obj
