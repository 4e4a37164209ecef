"""Golden analyzer tests — mirrors the reference's table-driven golden-array
unit tests (crawler/crawler_test.go:194-267, compared via EqualArrays :87-97)."""

from __future__ import annotations


from ucuddle_search_engine_spark.functions.analyze import (
    analyze_query,
    tokenize_col,
    tokenize_with_positions_udf,
)

GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("spark_SQL  v3.5.0\n\trocks", ["spark", "sql", "v3", "5", "0", "rocks"]),
    ("", []),
    ("...---...", []),
    ("MixedCASE tokens42 and42mixed", ["mixedcase", "tokens42", "and42mixed"]),
    ("a b  c   d", ["a", "b", "c", "d"]),
]


def test_analyze_query_golden():
    for raw, expected in GOLDEN:
        assert analyze_query(raw) == expected


def test_tokenize_col_matches_python(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(GOLDEN)], "id long, raw string")
    rows = {r["id"]: r["toks"] for r in df.select("id", tokenize_col("raw").alias("toks")).collect()}
    for i, (_, expected) in enumerate(GOLDEN):
        assert rows[i] == expected


def test_tokenize_udf_positions(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(GOLDEN)], "id long, raw string")
    rows = {r["id"]: r["toks"] for r in df.select("id", tokenize_with_positions_udf("raw").alias("toks")).collect()}
    for i, (_, expected) in enumerate(GOLDEN):
        got = [(t["term"], t["pos"]) for t in rows[i]]
        assert got == [(t, p) for p, t in enumerate(expected)]


def test_query_side_equals_index_side(spark):
    """K5 parity: same analyzer at search time as at index time."""
    texts = [raw for raw, _ in GOLDEN]
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    jvm = [r[0] for r in df.select(tokenize_col("raw")).collect()]
    assert jvm == [analyze_query(t) for t in texts]


# ---------------------------------------------------------------------------
# Configurable analyzer chain (stop + stem + Unicode tokens): K3/K4 with the
# reference's ukrainian/russian analyzer shape (functs_with_elastic.go:136-157)
# ---------------------------------------------------------------------------

from ucuddle_search_engine_spark.functions.analyze import (  # noqa: E402
    ANALYZERS,
    Analyzer,
    IDENTITY_ANALYZER,
    make_termvector_udf,
)

ANALYZER_TEXTS = [
    "The windows and streams for customers are closing quickly",
    "Classes of glasses; class is in session, studies studied ties",
    "и вот на столе книги и статьи о проектах компании",
    "і це на столі книги та статті про проєкти компанії",
    "Mixed língua text: the окно and вікно for systems 42",
    "",
]


def test_en_stemmer_golden():
    an = ANALYZERS["en"]
    golden = {
        "windows": "window", "streams": "stream", "customers": "customer",
        "closing": "clos", "quickly": "quick", "classes": "class",
        "class": "class", "glasses": "glass", "studies": "studi",
        "the": "the",  # stemming only; stopword removal is a separate stage
        "king": "king",  # min_stem guard: 4-3 < 3
    }
    for raw, want in golden.items():
        assert an.stem_py(raw) == want, raw


def test_analyzer_stopwords_removed():
    an = ANALYZERS["en"]
    out = an.analyze_py("The windows and streams for customers")
    assert out == ["window", "stream", "customer"]
    ru = ANALYZERS["ru"]
    out_ru = ru.analyze_py("и вот на столе книги")
    assert "и" not in out_ru and "на" not in out_ru


def test_cyrillic_tokenization():
    ru = ANALYZERS["ru"]
    toks = ru.analyze_py("Вікно ОКНО окно39 test")
    assert toks  # Cyrillic must NOT tokenize to nothing
    ident = IDENTITY_ANALYZER.analyze_py("окно слово")
    assert ident == []  # ASCII identity analyzer drops Cyrillic (documented)


def test_analyzer_column_python_udf_parity(spark):
    """The SAME Analyzer instance must tokenize identically in all three
    execution forms: Column expression, Arrow UDF, driver Python."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ANALYZER_TEXTS)], "id long, raw string"
    )
    for name in ("en", "ru", "uk"):
        an = ANALYZERS[name]
        py = {i: an.analyze_py(t) for i, t in enumerate(ANALYZER_TEXTS)}
        col_rows = {r["id"]: r["toks"] for r in
                    df.select("id", an.tokens_col("raw").alias("toks")).collect()}
        assert col_rows == py, f"Column vs Python mismatch for {name}"
        udf = make_termvector_udf(an)
        udf_rows = {r["id"]: r["tv"] for r in df.select("id", udf("raw").alias("tv")).collect()}
        for i, toks in py.items():
            got = sorted((t["term"], t["tf"], list(t["positions"]), t["doclen"]) for t in udf_rows[i])
            agg = {}
            for p, t in enumerate(toks):
                agg.setdefault(t, []).append(p)
            want = sorted((t, len(ps), ps, len(toks)) for t, ps in agg.items())
            assert got == want, f"UDF vs Python mismatch for {name} doc {i}"


def test_analyzer_sql_parity_duckdb():
    """tokens_sql must reproduce analyze_py exactly in DuckDB — the oracle's
    view of the analyzer chain."""
    import duckdb

    con = duckdb.connect()
    for name in ("en", "ru", "uk"):
        an = ANALYZERS[name]
        for t in ANALYZER_TEXTS:
            got = con.execute(f"SELECT {an.tokens_sql('?')}", [t]).fetchone()[0]
            assert got == an.analyze_py(t), f"SQL vs Python mismatch for {name}: {t!r}"


def test_lang_routing(spark):
    from ucuddle_search_engine_spark.operators.routing import LangRoutedIndex, detect_lang

    assert detect_lang("the windows and streams for customers") == "en"
    assert detect_lang("el sistema para los datos") == "es"
    assert detect_lang("xyzzy 123") == "und"
    # charset prior: stopword-free Cyrillic queries (the most common real
    # shape — 2-3 content words) still route, like the reference's n-gram
    # langdetect (web/app.py:33): uk marks і/ї/є/ґ pick uk, ы/э/ъ/ё pick ru,
    # shared-alphabet text falls to ru (the reference's default store)
    assert detect_lang("погода львів") == "uk"
    assert detect_lang("выходные москва") == "ru"
    assert detect_lang("окна потоков") == "ru"
    assert detect_lang("okna zzz окна") == "und"  # Latin-dominant stays und


def test_charset_prior_three_form_parity(spark):
    """Python / Column / DuckDB-SQL renderings of lang_id (with the charset
    prior under the vote) agree on every probe string."""
    import duckdb

    from ucuddle_search_engine_spark.functions.textstats import (
        charset_prior_sql, lang_id)
    from ucuddle_search_engine_spark.operators.routing import detect_lang

    probes = [
        "the windows and streams for customers",   # vote: en
        "и вот окна закрываются",                  # vote: ru
        "погода львів",                            # prior: uk (і)
        "виправлення помилок і їх перевірка",      # vote or prior: uk
        "выходные москва",                         # prior: ru (ы)
        "окна потоков",                            # prior: shared → ru
        "okna zzz окна",                           # latin-dominant → und
        "xyzzy 123", "", "ПОГОДА ЛЬВІВ",           # case-folding path
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(probes)], "i long, text string")
    col_got = {r["i"]: r["l"] for r in df.select("i", lang_id("text").alias("l")).collect()}
    con = duckdb.connect()
    # SQL form: vote is inconclusive for pure-prior probes, so exercising
    # charset_prior_sql directly on each probe checks the prior's rendering;
    # the full vote+prior SQL is exercised by the text_stats oracle
    from ucuddle_search_engine_spark.functions.textstats import charset_prior_py

    for i, p in enumerate(probes):
        py = detect_lang(p)
        assert col_got[i] == py, f"Column vs Python mismatch on {p!r}"
        lit = "'" + p.replace("'", "''") + "'"
        sql_prior = con.execute(f"SELECT {charset_prior_sql(lit)}").fetchone()[0]
        assert sql_prior == charset_prior_py(p), f"SQL vs Python prior mismatch on {p!r}"


def test_lang_routed_index(spark):
    from ucuddle_search_engine_spark.operators.routing import LangRoutedIndex

    docs = spark.createDataFrame(
        [
            (0, "the stream window is in the system for the customer"),
            (1, "the window of the stream and the batch for it"),
            (2, "el sistema para los datos y la tabla"),
            (3, "zz qq ww"),
        ],
        "doc_id long, text string",
    )
    router = LangRoutedIndex(docs)
    lang, idx = router.route("the windows for streams")
    assert lang == "en"
    hits = router.search("the windows for streams", k=5, mode="or").collect()
    ids = {r["doc_id"] for r in hits}
    assert ids and ids <= {0, 1}  # only the English docs, via the en index
    # fallback: undetectable query routes to the identity index over all docs
    lang2, idx2 = router.route("zz qq")
    assert lang2 == "und" and idx2 is router.fallback


def test_fuzzy_expansion_and_search(spark):
    from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
    from ucuddle_search_engine_spark.operators.fuzzy import auto_distance, expand_terms, fuzzy_search

    assert [auto_distance(t) for t in ["ab", "abc", "abcde", "abcdef"]] == [0, 1, 1, 2]

    docs = spark.createDataFrame(
        [
            (0, "window stream merge window"),
            (1, "stream batch table"),
            (2, "wind vector data"),
        ],
        "doc_id long, text string",
    )
    idx = InvertedIndex.from_documents_table(docs)
    dictionary = idx.tstats.groupBy("term").agg({"df": "max"}).withColumnRenamed("max(df)", "df")
    exp = {(r["qterm"], r["term"]) for r in expand_terms(dictionary, ["windoq", "strem"]).collect()}
    assert ("windoq", "window") in exp          # 1 edit, d=2
    assert ("strem", "stream") in exp           # 1 edit, d=1
    assert ("windoq", "wind") in exp            # 2 edits, d=2
    assert ("strem", "merge") not in exp        # >1 edit at d=1
    assert all(t != "batch" for _, t in exp)

    hits = fuzzy_search(idx, ["windoq", "strem"], k=5).collect()
    ids = [r["doc_id"] for r in hits]
    assert set(ids) == {0, 1, 2}  # window/stream/wind expansions
    assert hits[0]["doc_id"] == 0  # doc 0 matches both query terms' expansions

    # cap: max_expansions=1 keeps only the highest-df expansion per qterm
    exp1 = expand_terms(dictionary, ["windoq", "strem"], max_expansions=1)
    per_q = {}
    for r in exp1.collect():
        per_q.setdefault(r["qterm"], set()).add(r["term"])
    assert all(len(v) == 1 for v in per_q.values())

    # the same fuzzy query over a written-store SegmentSearcher ranks identically
    from ucuddle_search_engine_spark.operators.segments import build_segments
    from ucuddle_search_engine_spark.operators.wand import SegmentSearcher

    segs = build_segments(idx.postings, idx.dstats, idx.cstats, num_shards=3)
    searcher = SegmentSearcher(segs, idx.tstats, idx.cstats, boosts=idx.boosts)
    disk = [(r["doc_id"], round(r["score"], 9)) for r in
            fuzzy_search(searcher, ["windoq", "strem"], k=5).collect()]
    mem = [(r["doc_id"], round(r["score"], 9)) for r in hits]
    assert disk == mem


def test_bag_signature_col_matches_python(spark):
    """Build-side packed bag signature (pure Column expr, written into
    tstats) must equal the serve-side Python mirror on every term — the
    columnar fuzzy prefilter compares one against the other, so any skew
    (e.g. ascii() vs ord() on Cyrillic, the F.filter two-arg lambda trap)
    would silently drop candidates."""
    from pyspark.sql import functions as F

    from ucuddle_search_engine_spark.operators import fuzzy as fz

    terms = ["window", "strem", "t00", "a", "модуль", "пошуку", "системи",
             "aаbб", "zz", "x" * 20, "абвгдежзабвгдежзабв"]
    df = spark.createDataFrame([(t,) for t in terms], "term string") \
        .withColumn("sig", fz.bag_signature_col(F.col("term")))
    got = {r["term"]: r["sig"] for r in df.collect()}
    assert got == {t: fz.bag_signature_py(t) for t in terms}
    # nibble unpack round-trips the packed layout
    import numpy as np

    sigs = np.array([fz.bag_signature_py(t) for t in terms], np.int64)
    nib = fz.sig_nibbles(sigs)
    for i, t in enumerate(terms):
        cnt = [0] * fz.BAG_BINS
        for c in t:
            cnt[ord(c) % fz.BAG_BINS] += 1
        assert list(nib[i]) == [min(v, 15) for v in cnt], t


def test_fuzzy_bag_prefilter_equivalence():
    """expand_terms_py's vectorized bag-distance prefilter (vocab ≥
    _BAG_FILTER_MIN) must produce EXACTLY the brute-force DP expansion set —
    the prefilter is a superset guarantee, never dropping a ≤d candidate.
    Random Latin + Cyrillic vocab (the 0xFF code-point binning must stay
    collision-safe, i.e. collisions only SHRINK the bag distance)."""
    import random

    from ucuddle_search_engine_spark.operators import fuzzy as fz

    rng = random.Random(7)
    alpha = "abcdefgh"
    cyr = "абвгдежз"
    vocab = {}
    for i in range(2600):  # ≥ _BAG_FILTER_MIN → prefilter path
        src = alpha if i % 3 else cyr
        t = "".join(rng.choice(src) for _ in range(rng.randint(2, 9)))
        vocab[t] = float(rng.randint(1, 50))
    queries = ["abcde", "hgf", "абвгд", "aаbб", "zz"]
    got = fz.expand_terms_py(vocab, queries, max_expansions=None)

    # brute force: same loop with the prefilter disabled
    old = fz._BAG_FILTER_MIN
    try:
        fz._BAG_FILTER_MIN = 10**9
        want = fz.expand_terms_py(vocab, queries, max_expansions=None)
    finally:
        fz._BAG_FILTER_MIN = old
    assert sorted(got) == sorted(want) and len(want) > 0

    # capped + prefixed variants agree too
    for kw in ({"max_expansions": 3}, {"prefix_length": 1}):
        a = fz.expand_terms_py(vocab, queries, **kw)
        try:
            fz._BAG_FILTER_MIN = 10**9
            b = fz.expand_terms_py(vocab, queries, **kw)
        finally:
            fz._BAG_FILTER_MIN = old
        assert sorted(a) == sorted(b), kw
