"""Fuzzy term matching — the reference's `fuzziness: "AUTO"` multi_match
(web_old/elastic_interaction.py:23): each query term expands to the dictionary
terms within its AUTO edit distance, and the expanded set scores as a plain
BM25 OR-group.

AUTO distance (the ES rule): len 0-2 → exact only, 3-5 → 1 edit, ≥6 → 2 edits.

Scale posture: expansion is ONE column-pruned scan of the term dictionary
(tstats) with a broadcast of the |q| query terms; the length-band filter
(|len(term) − len(q)| ≤ d) prunes before the levenshtein evaluation, and both
run JVM-side inside whole-stage codegen. With prefix_length ≥ 1 (ES
`prefix_length` — candidates must share the query term's first chars exactly),
the stored tstats `p1` first-char column turns the dictionary scan into a
PUSHED parquet filter (row-group-pruned, since tstats is term-sorted within
each tb directory) — at 10⁹-term dictionaries the scan reads only the query
terms' first-char bands. prefix_length=0 (the ES default) keeps the full-scan
semantics. Expansions are capped per query term by descending df (ES
max_expansions=50) BEFORE scoring, so the scoring fan-in is bounded; the
oracle-checked driver queries run uncapped to stay exactly SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_EXPANSIONS = 50  # ES default

# --- persisted character-bag signature ---------------------------------
# Terms carry a 64-bit bag signature in the written tstats dictionary:
# code points binned into 16 buckets (ord(c) % 16), each count clamped to
# 15 and packed into one nibble. Binning and clamping are both contractive
# (collisions cancel; clamp is 1-Lipschitz), so the nibble-wise L1 distance
# between two signatures is a LOWER bound on the true character-bag
# distance, which is itself ≤ 2·levenshtein — `sigdist ≤ 2d` is therefore a
# strict superset of the true ≤d set and never drops a real candidate.
# Persisting it (plus `tlen`) turns the fuzzy prefilter into columnar
# numpy over scan output instead of a Python pass over the vocabulary.
BAG_BINS = 16


def bag_signature_py(term: str) -> int:
    """Packed 16-nibble character-bag signature — Python mirror of
    bag_signature_col (build side), used on query terms at serve time."""
    cnt = [0] * BAG_BINS
    for c in term:
        cnt[ord(c) % BAG_BINS] += 1
    sig = 0
    for i, v in enumerate(cnt):
        sig |= min(v, 15) << (4 * i)
    return sig


def bag_signature_col(term) -> "F.Column":
    """Build-side packed bag signature, pure Column expressions (16 short
    array passes per term, JVM-side, build-time only). `ascii()` returns the
    full code point of the first character, so binning matches ord(c) % 16
    on the Python side for Cyrillic as well as ASCII."""
    chars = F.filter(F.split(term, ""), lambda c: c != F.lit(""))
    bins = F.transform(chars, lambda c: F.pmod(F.ascii(c), F.lit(BAG_BINS)))

    def _bin_eq(i: int):
        # single-parameter closure on purpose: a `lambda b, i=i:` default
        # would make Spark treat it as the TWO-argument (element, index)
        # form of filter() and silently bind the array index over i
        return lambda b: b == F.lit(i)

    sig = F.lit(0).cast("long")
    for i in range(BAG_BINS):
        cnt = F.size(F.filter(bins, _bin_eq(i)))
        sig = sig + F.shiftleft(F.least(cnt, F.lit(15)).cast("long"), 4 * i)
    return sig


def sig_nibbles(sigs: "np.ndarray") -> "np.ndarray":
    """(n,) int64/uint64 packed signatures → (n, 16) uint8 nibble counts.
    Pure views + strided stores — no per-row Python."""
    import numpy as np

    u8 = np.ascontiguousarray(sigs, dtype=np.int64).view(np.uint8).reshape(-1, 8)
    nib = np.empty((len(u8), BAG_BINS), np.uint8)
    nib[:, 0::2] = u8 & 0xF
    nib[:, 1::2] = u8 >> 4
    return nib


def auto_distance(term: str) -> int:
    """ES fuzziness=AUTO: 0 edits under 3 chars, 1 up to 5, else 2."""
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def auto_distance_col(qt) -> "F.Column":
    n = F.length(qt)
    return F.when(n < 3, F.lit(0)).when(n <= 5, F.lit(1)).otherwise(F.lit(2))


def expand_terms(dictionary: DataFrame, query_terms: list[str],
                 max_expansions: int | None = MAX_EXPANSIONS,
                 prefix_length: int = 0) -> DataFrame:
    """dictionary (term[, df]) × query terms → (qterm, term, dist) expansions.

    Broadcast the tiny query-term side; length-band prefilter, then exact
    levenshtein ≤ AUTO(qterm). With max_expansions, keep the top-df terms per
    qterm (requires a df column), matching ES's expansion cap.

    prefix_length ≥ 1 (ES semantics): candidates must share the query term's
    first prefix_length characters EXACTLY (they carry no edits). The first
    char of that band is applied as a literal isin filter BEFORE the join —
    over a stored dictionary it reaches the parquet scan as a pushed filter."""
    spark = dictionary.sparkSession
    qterms = sorted(set(query_terms))
    q = F.broadcast(spark.createDataFrame([(t,) for t in qterms], "qterm string"))
    dim = dictionary.select(
        "term", *([c for c in ("df",) if c in dictionary.columns])
    )
    if prefix_length >= 1:
        first = sorted({t[:1] for t in qterms if t})
        dim = dim.filter(F.substring("term", 1, 1).isin(first))
    d = auto_distance_col(F.col("qterm"))
    cand = dim.distinct().crossJoin(q)
    if prefix_length >= 1:
        cand = cand.filter(
            F.substring("term", 1, prefix_length) == F.substring("qterm", 1, prefix_length)
        )
    cand = (
        cand.filter(F.abs(F.length("term") - F.length("qterm")) <= d)
        .withColumn("dist", F.levenshtein("term", "qterm"))
        .filter(F.col("dist") <= d)
    )
    if max_expansions is not None and "df" in dictionary.columns:
        w = Window.partitionBy("qterm").orderBy(F.col("df").desc(), F.col("term").asc())
        cand = cand.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= max_expansions
        ).drop("_rk")
    return cand.select("qterm", "term", "dist")


def prefix_banded_dictionary(tstats: DataFrame, query_terms: list[str],
                             prefix_length: int = 0) -> DataFrame:
    """(term, df=max across fields) dictionary for fuzzy expansion. With
    prefix_length ≥ 1 over a written store's tstats (which carries the stored
    `p1` first-char column), the band lands BEFORE the aggregation as a plain
    In(p1, …) filter — pushed to the parquet scan and row-group-pruned by the
    term sort (plan-asserted in tests/test_plans.py)."""
    if prefix_length >= 1 and "p1" in tstats.columns:
        first = sorted({t[:1] for t in set(query_terms) if t})
        tstats = tstats.filter(F.col("p1").isin(first))
    if "tlen" in tstats.columns:
        # pushed length band: the union over query terms of
        # |tlen − len(q)| ≤ AUTO(q) — a plain range disjunction the parquet
        # scan evaluates before any row reaches the aggregation. Exactly
        # subsumed by expand_terms' per-qterm band, so semantics are
        # unchanged; at a 10⁹-term dictionary it prunes the scan itself.
        band = None
        for qt in sorted(set(query_terms)):
            d = auto_distance(qt)
            c = (F.col("tlen") >= len(qt) - d) & (F.col("tlen") <= len(qt) + d)
            band = c if band is None else (band | c)
        if band is not None:
            tstats = tstats.filter(band)
    return tstats.groupBy("term").agg(F.max("df").alias("df"))


def _lev_capped(a: str, b: str, cap: int) -> int:
    """Levenshtein with early exit once every band cell exceeds cap."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            best = min(best, v)
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


# vocabularies above this size get the vectorized bag-distance prefilter
# before any Python DP — the DP over a whole 10⁵-term first-char bucket is
# seconds; the numpy pass is milliseconds
_BAG_FILTER_MIN = 2000


def _bag_survivors(terms: list[str], qt: str, d: int) -> "np.ndarray":
    """Indices of terms whose BINNED character-multiset distance to qt is
    ≤ 2d. bag(t, q) ≤ 2·levenshtein(t, q) (one substitution moves two counts,
    one insert/delete one), and binning code points into 256 buckets can only
    LOWER the computed bag (collisions cancel), so the filter is a strict
    superset of the true ≤d set — never drops a real candidate."""
    import numpy as np

    lens = np.fromiter((len(t) for t in terms), np.int64, len(terms))
    keep = np.abs(lens - len(qt)) <= d
    idx0 = np.flatnonzero(keep)
    if not len(idx0):
        return idx0
    sub = [terms[i] for i in idx0]
    joined = "".join(sub)
    codes = np.fromiter((ord(c) & 0xFF for c in joined), np.int64, len(joined))
    owner = np.repeat(np.arange(len(sub)), lens[idx0])
    m = np.zeros((len(sub), 256), np.int32)
    np.add.at(m, (owner, codes), 1)
    qv = np.zeros(256, np.int32)
    for c in qt:
        qv[ord(c) & 0xFF] += 1
    bag = np.abs(m - qv).sum(axis=1)
    return idx0[bag <= 2 * d]


def expand_terms_py(vocab_df: dict[str, float], query_terms: list[str],
                    max_expansions: int | None = MAX_EXPANSIONS,
                    prefix_length: int = 0) -> list[str]:
    """Driver/serving-side mirror of expand_terms over an in-memory vocabulary
    {term: df}: same AUTO distances, same length-band prefilter, same
    prefix_length band, same df-desc/term-asc expansion cap — so the serving
    tier's fuzzy matches the Spark path's. The serving tier (scripts/serve.py)
    feeds this only the query terms' first-char buckets when prefix_length ≥ 1,
    mirroring the pushed p1 scan filter of the Column path. Large vocabularies
    first pass through a vectorized bag-distance prefilter (a guaranteed
    superset of the ≤d set), so the Python DP runs only on the survivors —
    ~30× less expansion latency on a 10⁵-term bucket, identical result."""
    out: set[str] = set()
    vocab_items = None
    for qt in sorted(set(query_terms)):
        d = auto_distance(qt)
        pre = qt[:prefix_length]
        if len(vocab_df) >= _BAG_FILTER_MIN:
            if vocab_items is None:
                vocab_items = list(vocab_df.items())
            terms_l = [t for t, _ in vocab_items]
            pool = [vocab_items[i] for i in _bag_survivors(terms_l, qt, d)]
        else:
            pool = vocab_df.items()
        cand = []
        for t, df_ in pool:
            if prefix_length >= 1 and t[:prefix_length] != pre:
                continue
            if abs(len(t) - len(qt)) <= d and _lev_capped(t, qt, d) <= d:
                cand.append((t, df_))
        if max_expansions is not None:
            cand.sort(key=lambda x: (-x[1], x[0]))
            cand = cand[:max_expansions]
        out.update(t for t, _ in cand)
    return sorted(out)


def fuzzy_search(idx, query_terms: list[str], k: int = 10,
                 max_expansions: int | None = MAX_EXPANSIONS,
                 round_dp: int | None = None,
                 prefix_length: int = 0) -> DataFrame:
    """Fuzzy OR search over an InvertedIndex OR a SegmentSearcher (both carry
    tstats + search_terms): expand each query term against the term
    dictionary, then score the distinct expanded set as a disjunctive BM25
    group (each expansion scored with its own idf — the
    'constant_score_blended' shape ES rewrites fuzzy queries to).

    With prefix_length ≥ 1 over a WRITTEN store, the p1 column filter lands
    before the dictionary aggregation — parquet reads only the matching
    first-char bands (plan-asserted in tests/test_plans.py)."""
    dictionary = prefix_banded_dictionary(idx.tstats, query_terms, prefix_length)
    expanded = expand_terms(dictionary, query_terms, max_expansions,
                            prefix_length=prefix_length)
    terms = sorted({r["term"] for r in expanded.select("term").distinct().collect()})
    spark = dictionary.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    kwargs = {"round_dp": round_dp} if round_dp is not None else {}
    return idx.search_terms(terms, k=k, mode="or", **kwargs)
