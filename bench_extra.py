"""Engine/job-overhead split for EVERY headline query (r7, VERDICT r6
directive 3) — bench.py is frozen for measurement, so the split lives here.

For each headline query this runs the same computation bench.py times and
reports, per query:
  - wall_s         — median end-to-end wall time (same methodology as bench.py)
  - exec_run_s     — sum of executor task run time across the query's jobs,
                     divided by the core count: the "perfectly parallel
                     compute" floor
  - exec_cpu_s     — same for task CPU time (excludes shuffle-fetch wait and
                     I/O blocking): the box-noise-immune engine-work figure
  - overhead_s     — wall_s − exec_run_s: scheduling + planning + Python
                     driver overhead + stage-tail idling

Cross-round comparisons should use exec_cpu_s: the r6 verdict showed suite
wall time swings ±50% with zero code change on this shared box, while task
CPU time tracks the engine. Implementation: each query runs in its own job
group; job→stage metrics come from the Spark UI REST API (enabled here;
bench.py keeps it off).

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ucuddle_search_engine_spark.operators.ann import cosine_topk_bruteforce  # noqa: E402
from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex  # noqa: E402
from ucuddle_search_engine_spark.operators.dedup import lsh_candidate_pairs  # noqa: E402
from ucuddle_search_engine_spark.operators.pagerank import pagerank  # noqa: E402
from ucuddle_search_engine_spark.operators.postings import build_postings_fast  # noqa: E402
from ucuddle_search_engine_spark.operators.segments import build_segments  # noqa: E402
from ucuddle_search_engine_spark.session import get_spark  # noqa: E402
from ucuddle_search_engine_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4049"))


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


class MetricsSession:
    def __init__(self, spark):
        self.spark = spark
        self.app_id = spark.sparkContext.applicationId

    def job_group_metrics(self, group: str) -> tuple[float, float]:
        """(executorRunTime_s, executorCpuTime_s) summed over the group's jobs."""
        jobs = _api(f"applications/{self.app_id}/jobs?status=succeeded")
        stage_ids = set()
        for j in jobs:
            if j.get("jobGroup") == group:
                stage_ids.update(j.get("stageIds", []))
        run_ms = cpu_ns = 0
        for sid in stage_ids:
            try:
                for attempt in _api(f"applications/{self.app_id}/stages/{sid}"):
                    run_ms += attempt.get("executorRunTime", 0)
                    cpu_ns += attempt.get("executorCpuTime", 0)
            except Exception:
                pass  # stage evicted from the UI store
        return run_ms / 1000.0, cpu_ns / 1e9


def main() -> None:
    spark = get_spark(
        "bench_extra", cores=CPUS, shuffle_partitions=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedJobs": "10000",
            "spark.ui.retainedStages": "10000",
        },
    )
    ms = MetricsSession(spark)
    sc = spark.sparkContext
    documents = load_table(spark, SF_DIR, "documents").cache()
    n_docs = documents.count()

    out: dict = {"sf": SF_DIR.rstrip("/").split("sf")[-1], "n_docs": n_docs,
                 "cpus": CPUS, "queries": {}}

    def run_split(name: str, fn, warm=True) -> None:
        if warm:
            fn()  # codegen + python-worker warmup outside timing
        walls, runs, cpus_ = [], [], []
        for t in range(N_TRIALS):
            group = f"{name}-{t}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
            sc.setJobGroup(None, None)
            r, c = ms.job_group_metrics(group)
            runs.append(r)
            cpus_.append(c)
        wall = statistics.median(walls)
        run = statistics.median(runs)
        cpu = statistics.median(cpus_)
        out["queries"][name] = {
            "wall_s": round(wall, 3),
            "exec_run_s": round(run / CPUS, 3),
            "exec_cpu_s": round(cpu / CPUS, 3),
            "exec_run_total_s": round(run, 2),
            "exec_cpu_total_s": round(cpu, 2),
            "overhead_s": round(wall - run / CPUS, 3),
        }
        print(f"{name}: wall={wall:.3f}s run/core={run / CPUS:.3f}s "
              f"cpu/core={cpu / CPUS:.3f}s", file=sys.stderr, flush=True)

    # same headline set as bench.py
    def index_build():
        idx = InvertedIndex.from_documents_table(documents)
        fp = build_postings_fast(idx.docs, fields={0: "content"})
        build_segments(fp, None, idx.cstats, num_shards=3).count()

    run_split("index_build", index_build)

    idx = InvertedIndex.from_documents_table(documents)
    idx.persist()
    qset = [(["merge", "spark", "window"], "and"), (["customer", "stream"], "or"),
            (["table"], "or"), (["batch", "group", "order"], "and")]

    def exact_set():
        for terms, mode in qset:
            idx.search_terms(terms, k=10, mode=mode).collect()

    run_split("bm25_exact_topk", exact_set)

    run_split("dedup_minhash_lsh",
              lambda: lsh_candidate_pairs(documents, hash_kind="xx64").count())

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    run_split("ann_cosine_topk",
              lambda: cosine_topk_bruteforce(emb, list(qvec), k=10).collect())

    events = load_table(spark, SF_DIR, "events")
    edges = (
        events.select((F.col("user_id") % 500).alias("src_doc_id"),
                      (F.col("event_id") % 500).alias("dst_doc_id"))
        .filter(F.col("src_doc_id") != F.col("dst_doc_id")).dropDuplicates()
    )
    ids = spark.range(500).select(F.col("id").alias("doc_id"))
    run_split("pagerank_5iter",
              lambda: pagerank(edges, ids, iterations=5).agg(F.sum("pagerank")).collect())

    for name in ["agg_pricing_summary", "join_nation_revenue", "topk_orders",
                 "window_latest_event"]:
        fn = entrymod.queries()[name]
        run_split(name, lambda fn=fn: fn(spark, SF_DIR).collect())

    print(json.dumps(out))


if __name__ == "__main__":
    main()
