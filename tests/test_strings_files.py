"""String-function parity (C1-C4) golden tests + file sources/sinks (S1/S2/S7)."""

from __future__ import annotations

import json


from ucuddle_search_engine_spark.functions.strings import (
    domain_of,
    normalize_url,
    normalize_ws,
    nth_occurrence,
)
from ucuddle_search_engine_spark.sources.files import read_links_text, read_seed_json, write_json_debug


def _one(spark, expr, value):
    return spark.createDataFrame([(value,)], "s string").select(expr.alias("v")).first()["v"]


def test_normalize_ws(spark):
    # golden cases mirror crawler/main.go:108 (strings.Fields + join)
    assert _one(spark, normalize_ws("s"), "  a\t\tb \n c  ") == "a b c"
    assert _one(spark, normalize_ws("s"), "x") == "x"
    assert _one(spark, normalize_ws("s"), "   ") == ""


def test_normalize_url(spark):
    # crawler/main.go:180-188: strip ?query, strip trailing /
    assert _one(spark, normalize_url("s"), "https://a.ua/path/?q=1") == "https://a.ua/path"
    assert _one(spark, normalize_url("s"), "https://a.ua/p//") == "https://a.ua/p"
    assert _one(spark, normalize_url("s"), "https://a.ua") == "https://a.ua"


def test_domain_of(spark):
    assert _one(spark, domain_of("s"), "https://news.example.ua/x/y?z=1") == "news.example.ua"


def test_nth_occurrence(spark):
    # crawler/helper_funcs.go:96-110 semantics: position of n-th occurrence
    assert _one(spark, nth_occurrence("s", "/", 3), "https://a.ua/b/c") == 13
    assert _one(spark, nth_occurrence("s", "/", 9), "https://a.ua/b/c") == 0


def test_seed_and_text_sources(spark, tmp_path):
    seed = tmp_path / "seed.json"
    seed.write_text(json.dumps({"links": ["https://a.ua", "https://b.ua"]}))
    links = [r["link"] for r in read_seed_json(spark, str(seed)).collect()]
    assert sorted(links) == ["https://a.ua", "https://b.ua"]

    txt = tmp_path / "links.txt"
    txt.write_text("https://x.ua\n\n  https://y.ua  \n")
    rows = [r["link"] for r in read_links_text(spark, str(txt)).collect()]
    assert sorted(rows) == ["https://x.ua", "https://y.ua"]


def test_json_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = str(tmp_path / "dump")
    write_json_debug(df, out)
    back = spark.read.json(out)
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_md5_prefix_column_python_parity(spark):
    """EVERY pruned read depends on the writer's Column-side bucket hash
    (md5_prefix_long) equaling the reader's Python-side one
    (md5_prefix_long_py): a divergence would silently prune to the WRONG
    directory and return empty results for affected terms. Pin the parity on
    adversarial inputs (ascii, digits, cyrillic, long, 1-char, unicode)."""
    import random

    from ucuddle_search_engine_spark.functions.hashing import (
        md5_prefix_long,
        md5_prefix_long_py,
        term_buckets,
    )
    from ucuddle_search_engine_spark.plans.build_index import TERM_BUCKETS

    rng = random.Random(11)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789абвгдеёжзийклмнопрстуфхцчшщыьэюяєіїґß€"
    words = sorted({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        for _ in range(300)
    } | {"a", "0", "я", "t" * 64})
    df = spark.createDataFrame([(w,) for w in words], "t string")
    got = {r["t"]: r["h"] for r in df.select("t", md5_prefix_long("t").alias("h")).collect()}
    for w in words:
        assert got[w] == md5_prefix_long_py(w), w
    # and the reader-side bucket helper matches the writer-side column math
    from pyspark.sql import functions as F

    col_buckets = {
        r["t"]: r["b"] for r in df.select(
            "t", F.pmod(md5_prefix_long("t"), F.lit(TERM_BUCKETS)).cast("int").alias("b")
        ).collect()
    }
    for w in words:
        assert term_buckets([w]) == [col_buckets[w]], w
