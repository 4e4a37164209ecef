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
