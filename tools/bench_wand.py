"""Micro-benchmark: disjunctive top-k algorithms over the 1M-doc segment
store (.data/million_segs, built by the round-1 1M run) — exact vectorized
scan vs the block-max pruned scorer (vectorized) vs the per-posting WAND loop.

Asserts rank identity between all three, times each over head/mid/tail query
mixes, and writes BENCH/wand_micro.json. Collection stats use a fixed avgdl
(identical inputs for every algorithm, so both the equivalence check and the
relative timings are valid regardless of the constant).

Run: python tools/bench_wand.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ucuddle_search_engine_spark.operators.wand import SegmentSearcher  # noqa: E402
from ucuddle_search_engine_spark.session import get_spark  # noqa: E402

SEGS = "/root/repo/.data/million_segs"
TSTATS = "/root/repo/.data/million_tstats"
CSTATS = "/root/repo/.data/million_cstats.json"
CORPUS = "/root/repo/.data/corpus_1000000"
N_DOCS = 1_000_000

# r7: the flat round-1 fixture no longer survives between sessions; fall back
# to the resumable-build store (same block-row schema under unit=/tb= dirs,
# and its cstats.json IS the true build-time stats file)
if not Path(SEGS).exists() and Path("/root/repo/.data/million_store/segments").exists():
    SEGS = "/root/repo/.data/million_store/segments"
    if not Path(CSTATS).exists():
        CSTATS = "/root/repo/.data/million_store/cstats.json"

QUERY_SETS = {
    "head2": ["t0", "t1"],
    "head4": ["t0", "t1", "t2", "t3"],
    "mid3": ["t50", "t120", "t300"],
    "mixed": ["t0", "t500", "t4000"],
}


def main() -> None:
    spark = get_spark("bench_wand", cores=8, shuffle_partitions=8)
    segs = spark.read.parquet(SEGS)
    if not Path(TSTATS).exists():
        segs.groupBy("term", "field").agg(F.sum("n").alias("df")).write.mode(
            "overwrite"
        ).parquet(TSTATS)
    tstats = spark.read.parquet(TSTATS)
    # cstats must be the TRUE build-time stats: stored max_impact bounds were
    # computed with the real avgdl — feeding a different avgdl would break the
    # block-max invariant (bounds no longer upper-bound live contributions)
    # and silently corrupt BOTH pruning algorithms. Compute once, cache.
    if not Path(CSTATS).exists():
        from ucuddle_search_engine_spark.operators.postings import build_docs
        from ucuddle_search_engine_spark.plans.build_index import _global_field_stats

        corpus = spark.read.parquet(CORPUS)
        docs = build_docs(corpus, num_shards=3, scale_ids="prefix")
        rows = [r.asDict() for r in _global_field_stats(docs).collect()]
        with open(CSTATS, "w") as f:
            json.dump(rows, f)  # repr round-trip: avgdl exact to the ULP
    import pandas as pd

    cstats = spark.createDataFrame(pd.read_json(CSTATS))
    searcher = SegmentSearcher(segs, tstats, cstats).prepare()

    out: dict = {"n_docs": N_DOCS, "queries": {}}
    for name, terms in QUERY_SETS.items():
        postings = tstats.filter(F.col("term").isin(terms)).agg(F.sum("df")).first()[0]
        res = {}
        times = {}
        for algo in ("exact", "wand", "wand_loop"):
            reps = []
            for _ in range(3):
                t0 = time.time()
                rows = [
                    (r["doc_id"], round(r["score"], 9))
                    for r in searcher.search_terms(terms, k=10, mode="or", algorithm=algo).collect()
                ]
                reps.append(time.time() - t0)
            res[algo] = rows
            times[algo] = round(sorted(reps)[1], 3)  # median of 3
        # Rank identity modulo ULP ties: different summation orders can flip
        # docs whose scores agree to ~1e-12; require equal rounded-score
        # vectors and identical doc sets within every non-boundary tie group.
        base = res["exact"]
        for algo in ("wand", "wand_loop"):
            other = res[algo]
            assert [s for _, s in base] == [s for _, s in other], f"score mismatch {name}/{algo}"
            groups: dict[float, set] = {}
            for (d1, s1), (d2, _) in zip(base, other):
                groups.setdefault(s1, set()).update([(1, d1), (2, d2)])
            scores = [s for _, s in base]
            for s, g in groups.items():
                if s != scores[-1]:  # boundary group may legitimately differ
                    a = {d for t, d in g if t == 1}
                    b = {d for t, d in g if t == 2}
                    assert a == b, f"doc mismatch {name}/{algo} at score {s}"
        out["queries"][name] = {"postings": int(postings), **{f"{a}_s": t for a, t in times.items()}}
        print(name, out["queries"][name], flush=True)

    with open("/root/repo/BENCH/wand_micro.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
