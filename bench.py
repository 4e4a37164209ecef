"""Benchmark entry point (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index_docs_per_sec": ..., "bm25_p95_ms": ...}

Headline set: index build (docs → postings → compressed segments, forced),
BM25 exact top-k, WAND top-k over segments, MinHash-LSH dedup, ANN cosine
top-k, PageRank(5 iter) on the event graph, and the relational operator
queries from __spark_entry__. Scaling-efficiency evidence (local[8] vs
local[32]) is produced separately by tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ucuddle_search_engine_spark.operators.ann import cosine_topk_bruteforce  # noqa: E402
from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex  # noqa: E402
from ucuddle_search_engine_spark.operators.dedup import lsh_candidate_pairs  # noqa: E402
from ucuddle_search_engine_spark.operators.pagerank import pagerank  # noqa: E402
from ucuddle_search_engine_spark.operators.segments import build_segments  # noqa: E402
from ucuddle_search_engine_spark.operators.wand import SegmentSearcher  # noqa: E402
from ucuddle_search_engine_spark.session import get_spark  # noqa: E402
from ucuddle_search_engine_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=int(CPUS))
    queries: dict[str, float] = {}

    documents = load_table(spark, SF_DIR, "documents").cache()
    n_docs = documents.count()

    # 1. index build throughput: docs -> per-doc termvectors -> one combined
    #    shuffle -> compressed segments (forced via cache+count)
    from ucuddle_search_engine_spark.operators.postings import build_postings_fast

    t0 = time.time()
    idx = InvertedIndex.from_documents_table(documents)
    fast_postings = build_postings_fast(idx.docs, fields={0: "content"})
    segments = build_segments(fast_postings, None, idx.cstats, num_shards=3).cache()
    segments.count()
    build_s = time.time() - t0
    queries["index_build"] = build_s
    index_docs_per_sec = n_docs / build_s

    idx.persist()
    searcher = SegmentSearcher(segments, idx.tstats, idx.cstats, boosts=idx.boosts).prepare()

    # 2. query latency: exact Column-expression BM25 and the segment path
    qset = [(["merge", "spark", "window"], "and"), (["customer", "stream"], "or"),
            (["table"], "or"), (["batch", "group", "order"], "and")]
    lat = []
    for _ in range(3):
        for terms, mode in qset:
            t0 = time.time()
            idx.search_terms(terms, k=10, mode=mode).collect()
            lat.append(time.time() - t0)
    lat.sort()
    queries["bm25_exact_topk"] = sum(lat) / len(lat)

    wlat = []
    for _ in range(3):
        for terms, mode in qset:
            t0 = time.time()
            searcher.search_terms(terms, k=10, mode=mode).collect()
            wlat.append(time.time() - t0)
    wlat.sort()
    bm25_p95 = wlat[int(len(wlat) * 0.95) - 1] * 1000  # segment path = the engine's query path
    queries["bm25_wand_topk"] = sum(wlat) / len(wlat)

    # 3. training-data pipeline ops
    # production fast path: 64-bit xxhash64 signatures (8-byte shuffle keys);
    # the md5 hex-string variant stays the oracle-checked driver query
    queries["dedup_minhash_lsh"] = timed(
        lambda: lsh_candidate_pairs(documents, hash_kind="xx64").count()
    )
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    queries["ann_cosine_topk"] = timed(lambda: cosine_topk_bruteforce(emb, list(qvec), k=10).collect())

    # 4. PageRank (5 iterations) over a synthetic follow graph from events
    events = load_table(spark, SF_DIR, "events")
    edges = (
        events.select(
            (F.col("user_id") % 500).alias("src_doc_id"),
            (F.col("event_id") % 500).alias("dst_doc_id"),
        )
        .filter(F.col("src_doc_id") != F.col("dst_doc_id"))
        .dropDuplicates()
    )
    ids = spark.range(500).select(F.col("id").alias("doc_id"))
    queries["pagerank_5iter"] = timed(lambda: pagerank(edges, ids, iterations=5).agg(F.sum("pagerank")).collect())

    # 5. relational operator queries from the driver contract
    for name in ["agg_pricing_summary", "join_nation_revenue", "topk_orders", "window_latest_event"]:
        fn = entrymod.queries()[name]
        queries[name] = timed(lambda fn=fn: fn(spark, SF_DIR).collect())

    # 6. serving-tier latency (search_local: pyarrow read + numpy scorers, no
    #    Spark job) over a written store — cached across runs; reported as its
    #    own fields, NOT added to the headline total (the headline set is
    #    unchanged since round 1 so totals stay comparable across rounds)
    serve_p50 = serve_p95 = None
    try:
        from ucuddle_search_engine_spark.operators.wand import SegmentSearcher as _SS
        from ucuddle_search_engine_spark.plans.build_index import build_index_resumable

        sf_tag = SF_DIR.rstrip("/").split("sf")[-1]
        store = f"/root/repo/.data/bench_store_sf{sf_tag}"
        if not os.path.exists(os.path.join(store, "cstats.json")):
            corpus = documents.select(
                F.concat(F.lit("bench"), (F.col("doc_id") % 8).cast("string")).alias("repo"),
                F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
                F.md5(F.col("text")).alias("commit"),
                F.col("lang"),
                F.col("text").alias("content"),
            )
            build_index_resumable(spark, corpus, store, n_units=2, num_shards=3)
        local = _SS.open_local(store)
        slat = []
        for _ in range(3):
            for terms, mode in qset:
                t0 = time.time()
                local.search_local(terms, k=10, mode=mode)
                slat.append(time.time() - t0)
        slat.sort()
        serve_p50 = round(slat[len(slat) // 2] * 1000, 1)
        serve_p95 = round(slat[int(len(slat) * 0.95) - 1] * 1000, 1)
    except Exception:
        pass  # serving metrics are additive; never fail the suite for them

    total = sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (index build + BM25/WAND top-k + dedup + ANN + PageRank + relational)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in queries.items()},
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "n_docs": n_docs,
                "index_docs_per_sec": round(index_docs_per_sec, 1),
                "bm25_p95_ms": round(bm25_p95, 1),
                "serve_p50_ms": serve_p50,
                "serve_p95_ms": serve_p95,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
