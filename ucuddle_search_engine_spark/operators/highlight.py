"""Snippet generation + display post-processing for search results.

The reference gets highlights from ES (sentinel pre/post tags configured at
web/elastic_interaction.py:37-47) and post-processes each hit: strip HTML,
replace the sentinels with <b>/</b> (web/elastic_interaction.py:87-96), and
capitalize the title's first letter (:84). Because our postings retain token
positions (schema.POSTINGS_SCHEMA — the reason ES keeps them for `text`
fields), snippets are computed natively: pick the densest window of query-term
hits and bold the matched tokens.

Plan shape: the per-hit work is k rows (k ≤ 20) — positions come from a
broadcast semi-filtered postings scan, the text from a broadcast join with the
docs table, and the window/bold assembly is one Arrow batch through a pandas
UDF. Nothing here scales with corpus size at query time.
"""

from __future__ import annotations



import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analyze import _PY_TOKEN_RE

PRE, POST = "<b>", "</b>"
SNIPPET_TOKENS = 24


def capitalize_title(col: Column | str) -> Column:
    """C6: upper-case the first letter only (web/elastic_interaction.py:84)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.upper(F.substring(c, 1, 1)), c.substr(F.lit(2), F.length(c)))


def _snippet(text: str, match_pos: list[int], window: int = SNIPPET_TOKENS) -> str:
    """Densest-window snippet with matched tokens bolded.

    match_pos are token positions from the postings (same tokenizer). Token
    boundaries are re-derived with the shared regex on the ORIGINAL text so
    the snippet preserves original casing/punctuation between tokens.
    """
    if not match_pos:
        return ""
    spans = [m.span() for m in _PY_TOKEN_RE.finditer(text.lower())]
    match_set = {p for p in match_pos if p < len(spans)}
    if not match_set:
        return ""
    ordered = sorted(match_set)
    # densest window: maximize matches inside a window of SNIPPET_TOKENS tokens
    best_start, best_hits = ordered[0], 1
    for i, p in enumerate(ordered):
        hits = sum(1 for q in ordered[i:] if q < p + window)
        if hits > best_hits:
            best_start, best_hits = p, hits
    w0 = max(0, best_start - 3)
    w1 = min(len(spans), w0 + window)
    out = []
    if w0 > 0:
        out.append("… ")
    cursor = spans[w0][0]
    for tpos in range(w0, w1):
        s, e = spans[tpos]
        out.append(text[cursor:s])
        tok = text[s:e]
        out.append(f"{PRE}{tok}{POST}" if tpos in match_set else tok)
        cursor = e
    if w1 < len(spans):
        out.append(" …")
    return "".join(out)


@F.pandas_udf(T.StringType())
def snippet_udf(text: pd.Series, positions: pd.Series) -> pd.Series:
    return pd.Series(
        [_snippet(t, list(p) if p is not None else []) for t, p in zip(text, positions)],
        index=text.index,
    )


def highlight_hits(topk: DataFrame, docs: DataFrame, postings: DataFrame, terms: list[str],
                   keep_positions: bool = False) -> DataFrame:
    """topk (doc_id, score) → (doc_id, score[, match_positions], snippet).

    Match positions come from the already-built postings (no re-scoring, no
    re-tokenize of the corpus): filter to the query terms, semi-join to the k
    hit ids (broadcast), merge the per-term position arrays per doc.
    keep_positions exposes the merged position array — positions are derived
    from the SHARED tokenizer, so they are SQL-oracle-checkable even though
    the rendered snippet text is engine-defined.
    """
    terms = sorted(set(terms))
    hit_ids = F.broadcast(topk.select("doc_id"))
    pos = (
        postings.filter(F.col("term").isin(terms) & (F.col("field") == 0))
        .join(hit_ids, "doc_id")
        .groupBy("doc_id")
        .agg(F.array_sort(F.flatten(F.collect_list("positions"))).alias("match_positions"))
    )
    content = docs.select("doc_id", "content").join(hit_ids, "doc_id")
    cols = ["doc_id", "score"] + (["match_positions"] if keep_positions else [])
    return (
        F.broadcast(topk)
        .join(pos, "doc_id", "left")
        .join(content, "doc_id")
        .select(
            *cols,
            snippet_udf(F.col("content"), F.col("match_positions")).alias("snippet"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
