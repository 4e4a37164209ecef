"""Phrase matching from stored token positions.

The reference's ES mappings keep positions for `text` fields (that is what
makes its search_quote_analyzer / quoted queries work —
crawler/functs_with_elastic.go:85-94 configures it), and our postings retain
them (schema.POSTINGS_SCHEMA K6). A phrase match "a b c" is a doc where some
position p has a@p, b@p+1, c@p+2.

Relational realization (all JVM ops, SQL-oracle-replayable): explode the first
term's positions, then for each subsequent term a join on doc_id +
array_contains(positions, p+i) — a chain of hash joins over only the phrase
terms' postings (pruned scan), never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import idf_col, tf_norm_col


def phrase_match(postings: DataFrame, terms: list[str], field: int = 0) -> DataFrame:
    """(doc_id, phrase_tf) for docs containing the exact term sequence."""
    if not terms:
        raise ValueError("empty phrase")
    first = (
        postings.filter((F.col("term") == terms[0]) & (F.col("field") == field))
        .select("doc_id", F.explode("positions").alias("p"))
    )
    out = first
    for i, t in enumerate(terms[1:], start=1):
        nxt = (
            postings.filter((F.col("term") == t) & (F.col("field") == field))
            .select(F.col("doc_id").alias("d2"), F.col("positions").alias(f"pos{i}"))
        )
        out = out.join(nxt, (out.doc_id == nxt.d2) & F.array_contains(F.col(f"pos{i}"), out.p + i)).drop(
            "d2", f"pos{i}"
        )
    return out.groupBy("doc_id").agg(F.count("*").cast("long").alias("phrase_tf"))


def phrase_search(
    postings: DataFrame,
    dstats: DataFrame,
    cstats: DataFrame,
    terms: list[str],
    k: int = 20,
    field: int = 0,
) -> DataFrame:
    """BM25-scored phrase top-k: the phrase is scored as one pseudo-term with
    tf = phrase_tf and df = number of docs containing the phrase (how Lucene
    scores a PhraseQuery)."""
    matches = phrase_match(postings, terms, field=field)
    n_phrase_docs = matches.count()
    coll = {r["field"]: (r["n_docs"], r["avgdl"]) for r in cstats.collect()}
    n_docs, avgdl = coll[field]
    scored = (
        matches.join(dstats.filter(F.col("field") == field), "doc_id")
        .select(
            "doc_id",
            (
                idf_col(F.lit(float(n_phrase_docs)), F.lit(float(n_docs)))
                * tf_norm_col(F.col("phrase_tf").cast("double"), F.col("doclen").cast("double"), F.lit(float(avgdl)))
            ).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
