"""Persisted per-language index family — the reference's actual deployment:
one ES index per language, each with that language's analyzer chain
(crawler/functs_with_elastic.go:71-76,130 creates ukr/rus indexes; the web
tier detects the query language and picks the index, web/app.py:33 +
web/elastic_interaction.py:53-57).

build_routed_stores partitions the corpus by its language label and runs the
standard resumable build per language WITH that language's Analyzer (the
config is persisted inside each store, so reloaded query analysis is
identical — K5 for written stores). RoutedStores reloads the family and
routes queries by explicit language or by the stopword-vote detector.

Scale posture: per-language builds are independent (run them concurrently on
a cluster); routing adds nothing to the per-query plan — one language's store
is searched, with its own BM25 stats, exactly like per-index ES stats.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analyze import ANALYZERS, Analyzer
from ..operators.routing import detect_lang
from .build_index import build_index_resumable, load_analyzer, load_searcher


def build_routed_stores(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    lang_col: str = "lang",
    analyzers: dict[str, Analyzer] | None = None,
    n_units: int = 2,
    num_shards: int = 3,
    fallback_lang: str | None = None,
) -> dict:
    """One store per distinct language label under out_dir/lang=<l>, each
    built with its language's analyzer (ANALYZERS preset or identity).

    fallback_lang: where UNROUTABLE queries go — the reference's else-branch
    sends unknown-language queries to its ru index
    (web/elastic_interaction.py:53-57). None (default) keeps the stricter
    empty-result behavior."""
    langs = sorted(r[0] for r in corpus.select(lang_col).distinct().collect())
    # validate BEFORE the expensive per-language builds, not after
    if fallback_lang is not None and fallback_lang not in langs:
        raise ValueError(f"fallback_lang {fallback_lang!r} has no store (langs={langs})")
    amap = {**{lang: ANALYZERS.get(lang) for lang in langs}, **(analyzers or {})}
    stats = {}
    for lang in langs:
        sub = corpus.filter(F.col(lang_col) == lang)
        stats[lang] = build_index_resumable(
            spark, sub, os.path.join(out_dir, f"lang={lang}"),
            n_units=n_units, num_shards=num_shards, analyzer=amap.get(lang),
        )
    with open(os.path.join(out_dir, "routing.json"), "w") as f:
        json.dump({"langs": langs, "lang_col": lang_col, "fallback": fallback_lang}, f)
    return stats


class RoutedStores:
    """Reloaded per-language store family + query router."""

    def __init__(self, spark: SparkSession, out_dir: str):
        with open(os.path.join(out_dir, "routing.json")) as f:
            meta = json.load(f)
        self.langs = meta["langs"]
        self.fallback = meta.get("fallback")
        self.searchers = {
            lang: load_searcher(spark, os.path.join(out_dir, f"lang={lang}"))
            for lang in self.langs
        }
        self.analyzers = {
            lang: load_analyzer(os.path.join(out_dir, f"lang={lang}"))
            for lang in self.langs
        }
        self._spark = spark

    def search(self, query: str, lang: str | None = None, k: int = 10, mode: str = "or") -> DataFrame:
        """Explicit lang (the crawler's per-site label) or detect from the
        query text (the web tier's branch). Unroutable → the configured
        fallback store when routing.json carries one (the reference's
        else-branch routes unknown languages to ru,
        web/elastic_interaction.py:53-57), else an empty result."""
        detected = lang is None
        lang = lang or detect_lang(query)
        # the fallback mirrors the reference's unknown-DETECTED-language
        # branch only; an EXPLICIT missing lang stays a strict empty result
        # (silently answering from another language's store would mislabel)
        if lang not in self.searchers and detected and self.fallback is not None:
            lang = self.fallback
        if lang not in self.searchers:
            return self._spark.createDataFrame([], "doc_id long, score double")
        an = self.analyzers[lang]
        if an is None:
            from ..functions.analyze import analyze_query

            terms = analyze_query(query)
        else:
            terms = an.analyze_py(query)
        if not terms:
            return self._spark.createDataFrame([], "doc_id long, score double")
        return self.searchers[lang].search_terms(terms, k=k, mode=mode)
