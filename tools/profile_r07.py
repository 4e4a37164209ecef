"""Round-7 stage isolation profiler (guide §1.4): times each sub-stage of the
two dominant bench queries (index_build, dedup_minhash_lsh) with the noop sink
so the computation is measured, not the sink. Run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/profile_r07.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex  # noqa: E402
from ucuddle_search_engine_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signature_arrays,
)
from ucuddle_search_engine_spark.operators.postings import build_postings_fast  # noqa: E402
from ucuddle_search_engine_spark.operators.segments import build_segments  # noqa: E402
from ucuddle_search_engine_spark.session import get_spark  # noqa: E402
from ucuddle_search_engine_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, name, fn, out, n=N):
    ts = []
    for _ in range(n):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    ts_sorted = sorted(ts)
    out[name] = {"median": ts_sorted[len(ts) // 2], "all": ts}
    print(f"{name}: median={ts_sorted[len(ts)//2]} all={ts}", file=sys.stderr)


def main():
    spark = get_spark("profile_r07", cores=CPUS, shuffle_partitions=int(CPUS))
    out = {}
    documents = load_table(spark, SF_DIR, "documents").cache()
    documents.count()

    # --- index_build stages ---
    idx = InvertedIndex.from_documents_table(documents)
    # warm up codegen + python workers
    build_segments(build_postings_fast(idx.docs, fields={0: "content"}), None, idx.cstats,
                   num_shards=3).count()

    timeit(spark, "ib_cstats_only", lambda: idx.cstats.collect(), out)
    postings = build_postings_fast(idx.docs, fields={0: "content"})
    timeit(spark, "ib_termvector_explode_noop", lambda: noop(postings), out)
    timeit(spark, "ib_termvector_project_noop",
           lambda: noop(postings.select("term", "doc_id", "field", "tf", "doclen")), out)
    timeit(spark, "ib_full_segments_count",
           lambda: build_segments(build_postings_fast(
               InvertedIndex.from_documents_table(documents).docs, fields={0: "content"}),
               None, InvertedIndex.from_documents_table(documents).cstats, num_shards=3).count(),
           out)

    # --- dedup stages ---
    sig = minhash_signature_arrays(documents, hash_kind="xx64")
    timeit(spark, "dd_signatures_noop", lambda: noop(sig), out)
    timeit(spark, "dd_full_pairs_count",
           lambda: lsh_candidate_pairs(documents, hash_kind="xx64").count(), out)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
