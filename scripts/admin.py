"""Admin console — the reference's interactive maintenance menu
(elastic-interaction/main.go:153-310: index/search/delete/last-id/mapping/
drop) re-expressed over the parquet index store.

    python scripts/admin.py describe --index DIR
    python scripts/admin.py last-id --index DIR [--n 5]
    python scripts/admin.py search --index DIR --query "..." [--k 10] [--mode and]
    python scripts/admin.py delete-docs --index DIR --ids 1,2,3
    python scripts/admin.py drop --index DIR

With an Iceberg catalog these become DDL (DELETE FROM / DROP TABLE); on plain
parquet, delete-docs rewrites the docs dataset minus the ids (the segment
store keeps the postings until the next rebuild — ES likewise soft-deletes
until merge).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from ucuddle_search_engine_spark.functions.analyze import analyze_query
from ucuddle_search_engine_spark.plans.build_index import load_searcher
from ucuddle_search_engine_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["describe", "last-id", "search", "delete-docs", "drop",
                                    "alter", "merge", "since", "add-docs",
                                    "upgrade-layout"])
    ap.add_argument("--from", dest="from_corpus",
                    help="corpus parquet (repo,path,commit,lang,content) for `add-docs`")
    ap.add_argument("--index", required=True)
    ap.add_argument("--query")
    ap.add_argument("--ids")
    ap.add_argument("--ts", help="timestamp lower bound for `since` (docs added >= ts)")
    ap.add_argument("--local", action="store_true",
                    help="`search` only: serve-path ranked read (pyarrow + numpy, no JVM)")
    ap.add_argument("--add-column", help="name:type[:default] for `alter` (PutMapping analogue)")
    ap.add_argument("--with", dest="with_store",
                    help="comma-separated further stores for `merge` (rightmost wins conflicts)")
    ap.add_argument("--out", help="output dir for `merge`")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--mode", default="and", choices=["and", "or"])
    args = ap.parse_args()

    # fail fast on missing per-command flags — argparse has one flat flag
    # set, so without this a missing --with/--out/etc crashed deep in the
    # command (AttributeError on None.split) AFTER a full SparkSession spin-up
    required = {
        "search": ["query"], "delete-docs": ["ids"], "since": ["ts"],
        "alter": ["add_column"], "merge": ["with_store", "out"],
        "add-docs": ["from_corpus", "out"],
    }
    missing = [f for f in required.get(args.cmd, ()) if getattr(args, f) is None]
    if missing:
        flags = {"from_corpus": "--from", "with_store": "--with",
                 "add_column": "--add-column"}
        ap.error(f"{args.cmd} requires " + ", ".join(
            flags.get(f, "--" + f) for f in missing))

    if args.cmd == "drop":  # deleteIndexes (elastic_CRUD.go:185-192)
        shutil.rmtree(args.index)
        print(f"dropped {args.index}")
        return

    if args.cmd == "search" and args.local:
        # serving path: no SparkSession at all — store analyzer + pyarrow
        # reads + the same numpy scorers (rank-identical, tested)
        from ucuddle_search_engine_spark.operators.wand import SegmentSearcher
        from ucuddle_search_engine_spark.plans.build_index import load_analyzer

        an = load_analyzer(args.index)
        terms = an.analyze_py(args.query) if an is not None else analyze_query(args.query)
        s = SegmentSearcher.open_local(args.index)
        for doc_id, score in s.search_local(terms, k=args.k, mode=args.mode):
            print(f"{doc_id}\t{score:.6f}")
        return

    spark = get_spark("admin")

    if args.cmd == "upgrade-layout":
        # force-merge/reindex analogue: tstats prefilter columns + term-major
        # small-row-group segments/postings for stores built before either
        from ucuddle_search_engine_spark.plans.build_index import (
            upgrade_segments_layout,
            upgrade_tstats,
        )

        t = upgrade_tstats(spark, args.index)
        n = upgrade_segments_layout(spark, args.index)
        print(f"tstats {'rewritten' if t else 'already current'}; "
              f"{n} segment/postings unit(s) rewritten")
        return

    docs = spark.read.parquet(f"{args.index}/docs")

    if args.cmd == "describe":  # getIndexMapping (elastic_settings.go:94-101)
        docs.printSchema()
        segs = spark.read.parquet(f"{args.index}/segments")
        print(f"docs={docs.count()} segment_blocks={segs.count()} "
              f"shards={segs.select('shard').distinct().count()}")
    elif args.cmd == "last-id":  # last-id probe (elastic-interaction/main.go:111-151)
        for row in docs.orderBy(F.col("doc_id").desc()).limit(args.n).collect():
            print(row["doc_id"], row["repo"], row["path"])
    elif args.cmd == "search":  # searching (elastic_CRUD.go:71-139)
        # THE STORE'S analyzer, exactly like the --local branch: a stemmed/
        # Cyrillic store's index token space never matches the default ASCII
        # analyze_query (the search_analyzer == index analyzer pin)
        from ucuddle_search_engine_spark.plans.build_index import load_analyzer

        an = load_analyzer(args.index)
        terms = an.analyze_py(args.query) if an is not None else analyze_query(args.query)
        searcher = load_searcher(spark, args.index)
        for row in searcher.search_terms(terms, k=args.k, mode=args.mode).collect():
            print(f"{row['doc_id']}\t{row['score']:.6f}")
    elif args.cmd == "merge":  # Lucene/ES N-way segment merge analogue
        from ucuddle_search_engine_spark.plans.merge import merge_many

        others = [s for s in args.with_store.split(",") if s]
        stats = merge_many(spark, [args.index, *others], args.out)
        print(f"merged {1 + len(others)} stores into {args.out}: "
              f"{stats['n_docs']} docs (tombstones expunged)")
    elif args.cmd == "alter":  # PutMapping dance (elastic_settings.go:35-92)
        from ucuddle_search_engine_spark.plans.build_index import add_docs_column

        parts = args.add_column.split(":")
        name, dtype = parts[0], parts[1]
        default = parts[2] if len(parts) > 2 else None
        add_docs_column(spark, args.index, name, dtype, default)
        print(f"added column {name} {dtype} default={default}")
        spark.read.parquet(f"{args.index}/docs").printSchema()
    elif args.cmd == "add-docs":  # the reference's insert path (S8,
        # functs_with_elastic.go:245-362) over immutable stores: build a
        # delta store from the new corpus (same analyzer), N-way merge into
        # --out (new/updated keys win, tombstones expunged) — never
        # re-tokenizes the existing index
        import tempfile

        from ucuddle_search_engine_spark.plans.build_index import (
            build_index_resumable,
            load_analyzer,
        )
        from ucuddle_search_engine_spark.plans.merge import merge_many

        corpus = spark.read.parquet(args.from_corpus)
        with tempfile.TemporaryDirectory() as tmp:
            delta = f"{tmp}/delta"
            # match the base store's sidecar choice: if it serves highlight /
            # phrase from positions, the delta must carry them too or the
            # merge would (correctly) drop the sidecar for the whole output
            has_positions = os.path.isdir(os.path.join(args.index, "postings"))
            build_index_resumable(spark, corpus, delta, n_units=1,
                                  analyzer=load_analyzer(args.index),
                                  write_postings=has_positions)
            stats = merge_many(spark, [args.index, delta], args.out)
        print(f"added {corpus.count()} docs into {args.out}: {stats['n_docs']} total")
    elif args.cmd == "since":  # time-windowed maintenance: docs added >= ts
        # (added_at stamped at build, C10 / functs_with_elastic.go:311) —
        # feeds re-index / delete-by-age; parquet row-group min/max stats
        # skip old units without a full scan.
        # parse --ts on the driver: F.lit(garbage).cast("timestamp") is NULL
        # and the >= filter would silently report total=0 — a wrong answer
        # on a maintenance decision path, not an error
        from datetime import datetime

        try:
            ts = datetime.fromisoformat(args.ts)
        except ValueError:
            ap.error(f"--ts {args.ts!r} is not an ISO timestamp")
        hits = docs.filter(F.col("added_at") >= F.lit(ts))
        for row in hits.orderBy("doc_id").limit(args.k).collect():
            print(row["doc_id"], row["added_at"], row["repo"], row["path"])
        print(f"total={hits.count()}")
    elif args.cmd == "delete-docs":  # deleting (elastic_CRUD.go:141-183)
        # Soft delete: append tombstones; search anti-filters them until the
        # next rebuild (ES delete-until-merge). The docs/unit=N layout that
        # resume relies on is left untouched.
        ids = [int(x) for x in args.ids.split(",")]
        spark.createDataFrame([(i,) for i in ids], "doc_id long").coalesce(1).write.mode(
            "append"
        ).parquet(f"{args.index}/tombstones")
        print(f"tombstoned {len(ids)} docs")


if __name__ == "__main__":
    main()
