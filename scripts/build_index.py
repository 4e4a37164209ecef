"""spark-submit entry point: build the inverted index from a corpus table.

    spark-submit --py-files dist/engine.zip scripts/build_index.py \
        --corpus /path/to/corpus_parquet --out /path/to/index \
        [--units 64] [--shards 16] [--block 128] [--synth-docs N]

With --synth-docs N the corpus is synthesized first (for smoke/bench runs).
The build is checkpoint-resumable: rerunning after a crash skips parsed units
(plans/build_index.py manifest).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ucuddle_search_engine_spark.plans.build_index import build_index_resumable
from ucuddle_search_engine_spark.session import get_spark
from ucuddle_search_engine_spark.sources.testdata import load_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="corpus parquet/Iceberg path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--units", type=int, default=16)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--synth-docs", type=int, default=0)
    ap.add_argument("--write-postings", action="store_true",
                    help="also persist positional postings (enables highlight/phrase from disk)")
    args = ap.parse_args()

    spark = get_spark("build_index")
    if args.synth_docs:
        from ucuddle_search_engine_spark.synth import ensure_corpus

        args.corpus = ensure_corpus(spark, args.synth_docs, str(Path(args.out).parent / "synth"))
    corpus = load_corpus(spark, args.corpus)
    stats = build_index_resumable(
        spark, corpus, args.out, n_units=args.units, num_shards=args.shards,
        block_size=args.block, write_postings=args.write_postings,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
