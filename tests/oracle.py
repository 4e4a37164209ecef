"""Pure-pandas exact BM25 oracle — the executable analogue of 'rank-identical
to the reference query set' (SURVEY.md §5.2-2). Independent of all Spark code
except the shared token regex contract (re-stated here literally on purpose)."""

from __future__ import annotations

import math
import re
from collections import Counter

TOKEN_RE = re.compile(r"[a-z0-9]+")
K1, B = 1.2, 0.75


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def bm25_topk(docs: dict[int, str], query_terms: list[str], k: int = 10, mode: str = "and"):
    """docs: doc_id -> text. Returns [(doc_id, score)] with tie-break
    (score desc, doc_id asc)."""
    terms = sorted(set(query_terms))
    toks = {d: tokenize(t) for d, t in docs.items()}
    doclen = {d: len(ts) for d, ts in toks.items()}
    n = len(docs)
    avgdl = sum(doclen.values()) / n
    df = Counter()
    tf = {}
    for d, ts in toks.items():
        c = Counter(ts)
        tf[d] = c
        for t in terms:
            if c[t] > 0:
                df[t] += 1
    scores = []
    for d in docs:
        matched = [t for t in terms if tf[d][t] > 0]
        if mode == "and" and len(matched) != len(terms):
            continue
        if not matched:
            continue
        s = 0.0
        for t in matched:
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfn = tf[d][t] / (tf[d][t] + K1 * (1 - B + B * doclen[d] / avgdl))
            s += idf * tfn
        scores.append((d, s))
    scores.sort(key=lambda x: (-x[1], x[0]))
    return scores[:k]
