"""spark-submit entry point: query a built index.

    spark-submit scripts/search.py --index /path/to/index --query "spark window" [--k 20] [--mode and]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ucuddle_search_engine_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--mode", default="and", choices=["and", "or"])
    ap.add_argument("--offset", type=int, default=0, help="pagination (ES from)")
    ap.add_argument("--highlight", action="store_true",
                    help="bolded snippets from the positions sidecar (C7)")
    args = ap.parse_args()

    spark = get_spark("search")
    if len(args.query.strip()) < 3:  # length guard (web/app.py:30)
        print("query too short")
        return
    from ucuddle_search_engine_spark.plans.build_index import search_written

    out = search_written(spark, args.index, args.query, k=args.k, mode=args.mode,
                         highlight=args.highlight, offset=args.offset)
    for row in out.collect():
        extra = f"\t{row['snippet']}" if args.highlight else ""
        print(f"{row['doc_id']}\t{row['score']:.6f}{extra}")


if __name__ == "__main__":
    main()
