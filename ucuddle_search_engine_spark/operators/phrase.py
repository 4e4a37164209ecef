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

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import B, K1, idf_col, tf_norm_col


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


def phrase_search_local(store_dir: str, terms: list[str], k: int = 10,
                        field: int = 0, dead=None) -> list[tuple[int, float]]:
    """Serving-tier quoted-phrase top-k over a written store's positional
    sidecar — pyarrow pruned read + numpy adjacency, NO Spark job (the
    match_phrase analogue of SegmentSearcher.search_local). Bit-identical
    scores and ordering to phrase_search_written: the read prunes to the
    phrase terms' tb directories and term-sorted row groups, adjacency is a
    sorted-key merge ((doc_id << 32) | position composite keys — "a b" holds
    at start position p iff key(doc,p)+1 is among b's keys), and the
    PhraseQuery pseudo-term BM25 replicates idf_col/tf_norm_col's float op
    order exactly. `dead` (sorted tombstoned ids) removes deleted docs from
    BOTH the match set and the phrase df, as if they were never indexed.

    Scale shape: cost is O(Σ pruned postings of the |q| phrase terms), the
    same rows the distributed path shuffles — never the corpus; memory is the
    flattened (doc,pos) key arrays of the current term pair only."""
    import math

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pds

    from ..functions.hashing import term_buckets

    if not terms:
        raise ValueError("empty phrase")
    root = os.path.join(store_dir, "postings")
    if not os.path.isdir(root):
        raise FileNotFoundError(f"{store_dir} lacks the positional sidecar "
                                "(build with write_postings=True)")
    d = pds.dataset(root, format="parquet", partitioning="hive")
    flt = pds.field("term").isin(sorted(set(terms))) & (pds.field("field") == field)
    if "tb" in d.schema.names:
        flt = flt & pds.field("tb").isin(term_buckets(terms))
    tab = d.to_table(filter=flt,
                     columns=["term", "doc_id", "positions", "doclen"])

    # per-distinct-term sorted composite keys (units interleave doc ranges,
    # so a global sort per term is required once)
    keys_of: dict[str, np.ndarray] = {}
    first_docs = first_dls = None
    for t in set(terms):
        sub = tab.filter(pc.equal(tab.column("term"), t))
        docs = sub.column("doc_id").to_numpy()
        posl = sub.column("positions").combine_chunks()
        counts = pc.list_value_length(posl).to_numpy()
        flat = posl.flatten().to_numpy()
        keys = (np.repeat(docs.astype(np.int64), counts) << 32) | flat.astype(np.int64)
        keys.sort()
        keys_of[t] = keys
        if t == terms[0]:
            order = np.argsort(docs, kind="stable")
            first_docs = docs[order].astype(np.int64)
            first_dls = sub.column("doclen").to_numpy()[order].astype(np.int64)

    cur = keys_of[terms[0]]  # candidate phrase START positions
    for i, t in enumerate(terms[1:], start=1):
        if not len(cur):
            break
        kt = keys_of[t]
        if not len(kt):
            cur = cur[:0]
            break
        probe = cur + i
        idx = np.searchsorted(kt, probe)
        ok = idx < len(kt)
        ok[ok] = kt[idx[ok]] == probe[ok]
        cur = cur[ok]
    if not len(cur):
        return []

    match_docs = cur >> 32  # sorted (cur is a subset of sorted first-term keys)
    uniq, tf = np.unique(match_docs, return_counts=True)
    if dead is not None and len(dead):
        alive = ~np.isin(uniq, dead)
        uniq, tf = uniq[alive], tf[alive]
        if not len(uniq):
            return []

    with open(os.path.join(store_dir, "cstats.json")) as f:
        coll = {r["field"]: (r["n_docs"], r["avgdl"]) for r in json.load(f)}
    n_docs, avgdl = coll[field]
    # phrase_search float op order, verbatim: idf_col(lit(df), lit(n_docs)) *
    # tf_norm_col(tf, doclen, lit(avgdl))
    df_phrase = float(len(uniq))
    idf = math.log(1.0 + (float(n_docs) - df_phrase + 0.5) / (df_phrase + 0.5))
    dl = first_dls[np.searchsorted(first_docs, uniq)].astype(np.float64)
    tf = tf.astype(np.float64)
    score = idf * (tf / (tf + K1 * (1.0 - B + B * dl / float(avgdl))))
    order = np.lexsort((uniq, -score))[:k]
    return [(int(uniq[i]), float(score[i])) for i in order]
