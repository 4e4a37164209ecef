"""Persisted per-language stores: the reference's per-lang ES indexes with
their analyzer chains, rebuilt as a written store family + router."""

from __future__ import annotations

import pytest

from ucuddle_search_engine_spark.functions.analyze import ANALYZERS
from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
from ucuddle_search_engine_spark.plans.build_index import load_analyzer
from ucuddle_search_engine_spark.plans.routed import RoutedStores, build_routed_stores


@pytest.fixture(scope="module")
def bilingual(spark):
    rows = []
    en = [
        "the customer stream is closing for the window systems",
        "a window for the streams and the customers",
        "batch tables for the data vectors in the system",
        "closing windows quickly for many customers",
    ]
    ru = [
        "и вот окна закрываются в системе для потоков",
        "потоки и окна в таблице и данные",
        "система окон и потоков для таблицы",
        "и данные в таблицах потоков",
    ]
    for i, t in enumerate(en):
        rows.append((f"org/en{i % 2}", f"doc{i}.txt", f"{i:040x}", "en", t))
    for i, t in enumerate(ru):
        rows.append((f"org/ru{i % 2}", f"doc{i}.txt", f"{i:040x}", "ru", t))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).cache()


def test_routed_stores_roundtrip(spark, bilingual, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("routed"))
    stats = build_routed_stores(spark, bilingual, out, n_units=1)
    assert set(stats) == {"en", "ru"}

    router = RoutedStores(spark, out)
    # analyzer config round-trips exactly
    assert router.analyzers["ru"] == ANALYZERS["ru"]
    assert load_analyzer(f"{out}/lang=en") == ANALYZERS["en"]

    # Russian query: stopwords drop, inflections stem — matches inflected docs
    got_ru = router.search("и окно в системе", lang="ru", k=4, mode="or").collect()
    assert len(got_ru) >= 2  # 'окно' stem matches 'окна'/'окон', 'системе'→'систем'
    # English query routes by detection (no explicit lang)
    got_en = router.search("the windows for customers", k=4, mode="or").collect()
    assert len(got_en) >= 2

    # written per-lang store == in-memory index with the same analyzer
    sub = bilingual.filter("lang = 'ru'")
    idx = InvertedIndex.build(sub, num_shards=3, analyzer=ANALYZERS["ru"])
    terms = ANALYZERS["ru"].analyze_py("и окно в системе")
    want = [(r["doc_id"], round(r["score"], 9)) for r in idx.search_terms(terms, k=4, mode="or").collect()]
    got = [(r["doc_id"], round(r["score"], 9)) for r in got_ru]
    assert got == want

    # unsupported language → empty, like the reference
    assert router.search("xyzzy", lang="de", k=3).count() == 0


def test_serve_ru_store_end_to_end(spark, bilingual, tmp_path_factory):
    """The HTTP serving tier over a RU analyzer store: the query analyzes with
    the STORE's stop+stem chain (analyzer.json), ranking comes from
    search_local, and results equal the distributed path — the reference's
    primary Cyrillic read path served without a Spark job."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        from serve import SearchApp
    finally:
        sys.path.pop(0)
    from ucuddle_search_engine_spark.functions.analyze import ANALYZERS
    from ucuddle_search_engine_spark.plans.build_index import load_searcher

    out = str(tmp_path_factory.mktemp("routed_serve"))
    build_routed_stores(spark, bilingual, out, n_units=1)
    ru_store = os.path.join(out, "lang=ru")
    app = SearchApp(ru_store)

    q = "окна и потоков"  # stopword 'и' must drop, both nouns stem
    hits = app.search(q, k=5, mode="or")
    assert hits, "ru query must hit the ru store"
    terms = ANALYZERS["ru"].analyze_py(q)
    want = [(r["doc_id"], round(r["score"], 6)) for r in
            load_searcher(spark, ru_store).search_terms(terms, k=5, mode="or").collect()]
    assert [(h["doc_id"], h["score"]) for h in hits] == want


def test_routed_serve_detects_and_routes(spark, bilingual, tmp_path_factory):
    """RoutedSearchApp: a Russian query routes to the ru store (detected by
    the Cyrillic stopword vote), an English one to en, an undetectable one to
    nothing — the reference's full read path, Spark-free."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        from serve import RoutedSearchApp
    finally:
        sys.path.pop(0)

    out = str(tmp_path_factory.mktemp("routed_serve_root"))
    build_routed_stores(spark, bilingual, out, n_units=1)
    app = RoutedSearchApp(out)

    ru_hits = app.search("как окна и потоков", k=5)  # ru stopwords vote ru
    assert ru_hits and all(h["lang"] == "ru" for h in ru_hits)
    en_hits = app.search("the closing window for a customer", k=5)
    assert en_hits and all(h["lang"] == "en" for h in en_hits)
    # stopword-free Cyrillic (the reference's most common real query shape):
    # the charset prior routes it to ru, same hits as the voted form's terms
    nostop_hits = app.search("окна потоков", k=5)
    assert nostop_hits and all(h["lang"] == "ru" for h in nostop_hits)
    assert {h["doc_id"] for h in nostop_hits} == {h["doc_id"] for h in ru_hits}
    assert app.search("qqq zzz xxx", k=5) == []  # und → no store
    assert app.n_docs() == 8


def test_routed_serve_fallback_lang(spark, bilingual, tmp_path_factory):
    """The reference routes UNKNOWN-language queries to its ru index (the
    else-branch of web/elastic_interaction.py:53-57). With
    fallback_lang='ru', an undetectable query serves from the ru store (its
    analyzer included); without it, behavior stays strict-empty."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        from serve import RoutedSearchApp
    finally:
        sys.path.pop(0)

    out = str(tmp_path_factory.mktemp("routed_fb"))
    build_routed_stores(spark, bilingual, out, n_units=1, fallback_lang="ru")
    app = RoutedSearchApp(out)
    # zero stopword hits AND Latin-dominant script (the charset prior only
    # fires on Cyrillic-dominant text) → detect_lang = 'und'
    from ucuddle_search_engine_spark.operators.routing import detect_lang

    q = "okna zzz qqq окна"
    assert detect_lang(q) == "und"
    hits = app.search(q, k=5)
    assert hits and all(h["lang"] == "ru" for h in hits)
    # a store set without fallback keeps the strict behavior
    out2 = str(tmp_path_factory.mktemp("routed_nofb"))
    build_routed_stores(spark, bilingual, out2, n_units=1)
    assert RoutedSearchApp(out2).search(q, k=5) == []
    # misconfigured fallback refuses at build time
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fallback_lang"):
        build_routed_stores(spark, bilingual,
                            str(tmp_path_factory.mktemp("routed_bad")),
                            n_units=1, fallback_lang="zz")
