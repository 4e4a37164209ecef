"""Thin serving tier over a written store — the reference's Flask read path
(web/app.py:26-43 renders highlighted top-20 over HTTP) re-expressed without
any Spark job on the hot path:

- open the store Spark-free (SegmentSearcher.open_local: pyarrow term stats,
  cstats.json, tombstones),
- analyze the query with THE STORE'S analyzer (analyzer.json — the
  search_analyzer == index analyzer pin, crawler/functs_with_elastic.go:85-94),
- rank via search_local (directory-pruned pyarrow read + the same numpy
  scorers the distributed path uses — identical ranking, ms latency),
- fetch the k hit titles from the docs dataset (row-group-pruned id filter),
  capitalized like the reference does (C6, web/elastic_interaction.py:84).

stdlib http.server only — no framework dependencies.

    python scripts/serve.py --index DIR [--port 8080]
    GET /search?q=free+text&k=10&mode=or   → JSON hits
    GET /health                            → {"docs": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ucuddle_search_engine_spark.operators.wand import SegmentSearcher  # noqa: E402


def _load_analyzer_py(store_dir: str):
    """analyzer.json → analyze_py callable (identity chain when absent)."""
    path = os.path.join(store_dir, "analyzer.json")
    from ucuddle_search_engine_spark.functions.analyze import Analyzer, IDENTITY_ANALYZER

    if not os.path.exists(path):
        return IDENTITY_ANALYZER
    with open(path) as f:
        cfg = json.load(f)
    return Analyzer(
        token_pattern=cfg["token_pattern"],
        stopwords=tuple(cfg["stopwords"]),
        stem_rules=tuple((s, r) for s, r in cfg["stem_rules"]),
        min_stem=cfg["min_stem"],
    )


class SearchApp:
    def __init__(self, store_dir: str):
        self.store_dir = store_dir
        self.searcher = SegmentSearcher.open_local(store_dir)
        self.analyzer = _load_analyzer_py(store_dir)

    def search(self, q: str, k: int = 10, mode: str = "or",
               highlight: bool = False, fuzzy: bool = False) -> list[dict]:
        if len(q.strip()) < 3:  # length guard (web/app.py:30-31)
            return []
        terms = self.analyzer.analyze_py(q)
        if not terms:
            return []
        if fuzzy:
            # ES fuzziness:AUTO (web_old/elastic_interaction.py:23): expand
            # each term against the in-memory vocabulary, score the expanded
            # set as one disjunction — pure-Python mirror of the Spark path
            from ucuddle_search_engine_spark.operators.fuzzy import expand_terms_py

            vocab = {t: df for (t, f), df in self.searcher._tstats_cache.items() if f == 0}
            terms = expand_terms_py(vocab, terms)
            if not terms:
                return []
            mode = "or"
        hits = self.searcher.search_local(terms, k=k, mode=mode)
        if not hits:
            return []
        import pyarrow.dataset as pds

        ids = [d for d, _ in hits]
        want_snippets = highlight and os.path.isdir(os.path.join(self.store_dir, "postings"))
        cols = ["doc_id", "title", "repo", "path"] + (["content"] if want_snippets else [])
        tbl = pds.dataset(os.path.join(self.store_dir, "docs"), partitioning="hive").to_table(
            filter=pds.field("doc_id").isin(ids), columns=cols,
        )
        meta = {row["doc_id"]: row for row in tbl.to_pylist()}
        snippets: dict[int, str] = {}
        if want_snippets:
            # bolded densest-window snippets from the positional sidecar —
            # same _snippet the distributed highlight path uses (C7); the
            # sidecar read is a term+id-filtered pushdown scan, never the corpus
            from ucuddle_search_engine_spark.operators.highlight import _snippet

            pt = pds.dataset(os.path.join(self.store_dir, "postings"),
                             partitioning="hive").to_table(
                filter=(pds.field("term").isin(terms) & pds.field("doc_id").isin(ids)
                        & (pds.field("field") == 0)),
                columns=["doc_id", "positions"],
            )
            pos: dict[int, list[int]] = {}
            for row in pt.to_pylist():
                pos.setdefault(row["doc_id"], []).extend(row["positions"])
            for d, p in pos.items():
                snippets[d] = _snippet(meta[d]["content"], sorted(p))
        out = []
        for doc_id, score in hits:
            m = meta.get(doc_id, {})
            title = m.get("title") or ""
            title = (title[:1].upper() + title[1:]) if title else ""  # C6
            h = {"doc_id": doc_id, "score": round(score, 6), "title": title,
                 "repo": m.get("repo", ""), "path": m.get("path", "")}
            if want_snippets:
                h["snippet"] = snippets.get(doc_id, "")
            out.append(h)
        return out

    def n_docs(self) -> int:
        return int(self.searcher._coll[0][0]) if 0 in self.searcher._coll else 0


class RoutedSearchApp:
    """Language-routed serving over a RoutedStores root (plans/routed layout:
    out/lang=<l>/ + routing.json) — the reference's full read path: detect the
    query language (web/app.py:33) and serve from that language's store with
    its own analyzer (web/elastic_interaction.py:53-57). Detection is the
    same stopword vote the doc side used to build the stores."""

    def __init__(self, root_dir: str):
        with open(os.path.join(root_dir, "routing.json")) as f:
            self.langs = json.load(f)["langs"]
        self.apps = {
            lang: SearchApp(os.path.join(root_dir, f"lang={lang}")) for lang in self.langs
        }

    def search(self, q: str, k: int = 10, mode: str = "or", **kw) -> list[dict]:
        from ucuddle_search_engine_spark.operators.routing import detect_lang

        lang = detect_lang(q)
        app = self.apps.get(lang)
        if app is None:
            return []  # und / unrouted language: no matching store
        hits = app.search(q, k=k, mode=mode, **kw)
        for h in hits:
            h["lang"] = lang
        return hits

    def n_docs(self) -> int:
        return sum(a.n_docs() for a in self.apps.values())


def make_handler(app: SearchApp):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            u = urlparse(self.path)
            try:
                if u.path == "/health":
                    body = {"docs": app.n_docs()}
                elif u.path == "/search":
                    qs = parse_qs(u.query)
                    body = app.search(
                        q=qs.get("q", [""])[0],
                        k=min(int(qs.get("k", ["10"])[0]), 100),
                        mode=qs.get("mode", ["or"])[0],
                        highlight=qs.get("highlight", ["0"])[0] == "1",
                        fuzzy=qs.get("fuzzy", ["0"])[0] == "1",
                    )
                else:
                    self.send_error(404)
                    return
            except Exception as e:  # pragma: no cover - defensive
                self.send_error(500, str(e))
                return
            payload = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    return Handler


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="a single store dir, or a RoutedStores root with --routed")
    ap.add_argument("--routed", action="store_true",
                    help="treat --index as a per-language RoutedStores root")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    app = RoutedSearchApp(args.index) if args.routed else SearchApp(args.index)
    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(app))
    print(f"serving {args.index} on http://127.0.0.1:{args.port}  (/search?q=...&k=10&mode=or)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
