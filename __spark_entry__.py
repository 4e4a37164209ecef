"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship BM25 top-k search over sf0.001 documents.
queries()      — one entry per implemented operator from SURVEY.md §2.
oracle_sql()   — DuckDB-equivalent ANSI SQL per query (same column names).

Float-valued results are rounded to 6 dp on BOTH sides so the driver's
value-hash compare is robust to summation-order ulps.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ucuddle_search_engine_spark.functions.textstats import text_stats
from ucuddle_search_engine_spark.operators.ann import cosine_topk_bruteforce
from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
from ucuddle_search_engine_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ucuddle_search_engine_spark.operators.multimodal import attach_fake_payload, extract_features
from ucuddle_search_engine_spark.operators.pagerank import pagerank
from ucuddle_search_engine_spark.operators.routing import LangRoutedIndex, detect_lang
from ucuddle_search_engine_spark.operators.segments import build_segments
from ucuddle_search_engine_spark.operators.wand import SegmentSearcher
from ucuddle_search_engine_spark.sources.testdata import load_table

# Shared constants — keep Spark and SQL sides in lockstep.
TOKEN_PATTERN = "[a-z0-9]+"
K1, B = 1.2, 0.75
BM25_AND_TERMS = ["merge", "spark", "window"]   # sorted
BM25_OR_TERMS = ["customer", "stream"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    documents = load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = InvertedIndex.from_documents_table(documents)
    return idx.search("spark window merge", k=10, mode="and")


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _bm25(spark: SparkSession, sf_dir: str, terms: list[str], mode: str, k: int = 10) -> DataFrame:
    documents = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(documents)
    return idx.search_terms(terms, k=k, mode=mode, round_dp=6)


def _bm25_score_ctes(term_filter_sql: str, with_nterms: bool = False) -> str:
    """The BM25 scoring CTE chain (dl/coll/tf/dfreq/scored) over a
    previously-defined `toks(doc_id, term)` CTE — the ONE copy of the
    oracle-side scoring formula (previously pasted into four oracles, which
    had already drifted on term dedup). `term_filter_sql` is what goes in
    tf's `term IN (...)`; with_nterms adds the distinct-matched-terms count
    AND-mode filters on."""
    nterms = ",\n         count(*) AS nterms" if with_nterms else ""
    return f"""dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
coll AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doclen) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term IN ({term_filter_sql}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (coll.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doclen / coll.avgdl)) ) AS score{nterms}
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN coll
  GROUP BY tf.doc_id
)"""


def _bm25_sql(terms: list[str], mode: str, k: int = 10, offset: int = 0) -> str:
    # dedup exactly like the engine (search_terms does sorted(set(terms))):
    # the AND filter counts DISTINCT matched terms, so an un-deduped nterms
    # could never be satisfied by a query with a repeated term
    terms = sorted(set(terms))
    tlist = ", ".join(f"'{t}'" for t in terms)
    nterms = len(terms)
    and_filter = f"WHERE nterms = {nterms}" if mode == "and" else ""
    page = f"LIMIT {k} OFFSET {offset}" if offset else f"LIMIT {k}"
    return f"""
WITH toks AS ({TOKS_SQL}),
{_bm25_score_ctes(tlist, with_nterms=True)}
SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score
FROM scored {and_filter}
ORDER BY score DESC, doc_id ASC {page}
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)).alias("term"),
    )


def _shingle_expr(n: int) -> str:
    """DuckDB n-gram shingle expression over a token-list column `t` — ONE
    copy of the 1-based-inclusive window arithmetic (an off-by-one fix here
    fixes every oracle that shingles)."""
    return f"""unnest(CASE WHEN len(t) >= {n}
                    THEN list_transform(range(1, len(t) - {n - 2}),
                                        i -> array_to_string(t[i:i+{n - 1}], ' '))
                    ELSE CAST([] AS VARCHAR[]) END) AS shingle"""


TOKS_SQL = f"SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term FROM documents"

# 3-token shingles, distinct per doc (DuckDB list slicing is 1-based inclusive)
_SHINGLES_SQL = f"""
            t0 AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, {_shingle_expr(3)}
              FROM t0
            )"""


def _lang_hits_sql(toks_col: str = "vtoks") -> str:
    from ucuddle_search_engine_spark.functions.textstats import STOPWORDS

    cols = []
    for lang in sorted(STOPWORDS):
        arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        cols.append(f"len(list_intersect({toks_col}, [{arr}])) AS hits_{lang}")
    return ",\n                     ".join(cols)


def _text_stats_sql() -> str:
    """DuckDB mirror of functions.textstats.text_stats — fully programmatic
    over sorted(STOPWORDS) so adding a vote language extends the oracle too.
    The vote tokenizes over the ASCII+Cyrillic alphabet (vtoks); counting /
    fingerprint stay on the ASCII TOKEN_PATTERN (toks)."""
    from ucuddle_search_engine_spark.functions.textstats import (
        STOPWORDS, VOTE_TOKEN_PATTERN, charset_prior_sql)

    langs = sorted(STOPWORDS)
    hits_list = ", ".join(f"hits_{l}" for l in langs)
    best = f"greatest({hits_list})"
    n_at_max = "\n                      + ".join(
        f"CASE WHEN hits_{l} = {best} THEN 1 ELSE 0 END" for l in langs)
    pick = "\n                            ".join(
        f"WHEN hits_{l} = best THEN '{l}'" for l in langs)
    prior = charset_prior_sql("text")
    return f"""
            WITH base AS (
              SELECT doc_id, text,
                     regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS toks,
                     regexp_extract_all(lower(text), '{VOTE_TOKEN_PATTERN}') AS vtoks
              FROM documents
            ),
            hits AS (
              SELECT doc_id, text, toks,
                     {_lang_hits_sql()}
              FROM base
            ),
            m AS (
              SELECT doc_id, text, toks,
                     {hits_list},
                     {best} AS best,
                     ({n_at_max}) AS n_at_max,
                     CAST(len(toks) AS DOUBLE) AS n_tok,
                     CAST(length(text) AS DOUBLE) AS n_chars,
                     CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) AS alpha_chars
              FROM hits
            ),
            s AS (
              SELECT doc_id,
                     CAST(n_tok AS BIGINT) AS n_tokens,
                     CASE WHEN best > 0 AND n_at_max = 1 THEN
                       CASE {pick} END
                     ELSE {prior} END AS lang_pred,
                     (CASE WHEN n_tok >= 20 AND n_tok <= 10000 THEN 1.0
                           WHEN n_tok > 0 THEN 0.5 ELSE 0.0 END
                      + CASE WHEN n_tok > 0 AND alpha_chars / n_tok >= 2.0 AND alpha_chars / n_tok <= 12.0
                             THEN 1.0 ELSE 0.5 END
                      + CASE WHEN n_chars > 0 THEN alpha_chars / n_chars ELSE 0.0 END) / 3.0 AS q,
                     md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
              FROM m
            )
            SELECT doc_id, n_tokens, lang_pred, CAST(round(q, 6) AS DOUBLE) AS quality, fingerprint
            FROM s"""


_TEXT_STATS_SQL = _text_stats_sql()


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_bm25_topk_and(spark, sf_dir):
    """BM25 top-10, minimum_should_match=100% (web/elastic_interaction.py:27)."""
    return _bm25(spark, sf_dir, BM25_AND_TERMS, "and")


def q_bm25_topk_or(spark, sf_dir):
    return _bm25(spark, sf_dir, BM25_OR_TERMS, "or")


def q_term_stats_top(spark, sf_dir):
    """A1: document-frequency + collection-frequency stats, top 50 terms."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(50)
    )


def q_doc_stats(spark, sf_dir):
    """A1: per-document token length."""
    return _tokens(spark, sf_dir).groupBy("doc_id").agg(F.count("*").alias("doclen"))


def q_max_doc_id(spark, sf_dir):
    """A2: last-id probe (crawler/functs_with_elastic.go:369-383)."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.agg(F.max("doc_id").alias("max_doc_id"))


def q_agg_pricing_summary(spark, sf_dir):
    """A1/A5-style multi-agg groupBy (TPC-H Q1 shape) over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_nation_revenue(spark, sf_dir):
    """J3-style broadcast dim joins: orders ⋈ customer ⋈ nation → per-nation revenue."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"), F.count("*").alias("n_orders"))
    )


def q_topk_orders(spark, sf_dir):
    """T1/T4: global top-k with pinned tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q_window_latest_event(spark, sf_dir):
    """F9: dedup-keep-best via row_number window (web/elastic_interaction.py:60).

    r7 note (examined, deliberately left as the window form): a
    max_by(struct, struct) aggregation computes the same rows and would shrink
    the exchange from |events| to |users| rows, but struct-typed aggregation
    buffers force SortAggregate — the map side then sorts every event in the
    (single-row-group) scan task, and the measured bench time REGRESSED
    1.25 s → 2.9 s at sf1.0. The window form's exchange is what parallelizes
    the sort across cores here; revisit only if the events input arrives
    pre-split into many files."""
    events = load_table(spark, sf_dir, "events")
    # Scale-adaptive widening (opt guide §2.5 "input skew: one unsplittable
    # file → repartition right after the read"): the events table is ONE
    # parquet row group, so the window's map side — a full Sort feeding
    # WindowGroupLimit(Partial) — ran in a single task (measured r7: the sort
    # of the whole table on one core dominated the query). Hash-repartition
    # on user_id up to defaultParallelism: it satisfies the window's
    # ENSURE_REQUIREMENTS outright (no second exchange) and the sort runs on
    # every core. A no-op whenever the input already arrives in enough splits.
    par = spark.sparkContext.defaultParallelism
    if events.rdd.getNumPartitions() < par:
        events = events.repartition(par, F.col("user_id"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 6).alias("value"))
    )


def q_semi_join_active_customers(spark, sf_dir):
    """J1-style semi-join: customers having orders (EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_anti_join_inactive_customers(spark, sf_dir):
    """F2/F3 anti-join semantics: customers with no orders (NOT EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


def q_work_queue_fetch(spark, sf_dir):
    """S10/T2/F7: work-queue fetch — term filters + sort id asc + limit
    (task-manager/task_manager.py:54-94)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter((F.col("event_type") == "click") & (F.col("value") > 0))
        .orderBy(F.col("event_id").asc())
        .limit(100)
        .select("event_id", "user_id", F.round("value", 6).alias("value"))
    )


def q_filter_lang_minlen(spark, sf_dir):
    """F4/F5/F6: language + min-length predicates (crawler/main.go:206-236)."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.filter((F.col("lang").isin("en", "de")) & (F.col("n_chars") > 200)).select(
        "doc_id", "lang", "n_chars"
    )


def q_bm25_wand_and(spark, sf_dir):
    """Block-max WAND over the compressed segment store — must match the same
    oracle as the exact path (that IS the WAND correctness gate)."""
    documents = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(documents)
    segs = build_segments(idx.postings, idx.dstats, idx.cstats, num_shards=3)
    searcher = SegmentSearcher(segs, idx.tstats, idx.cstats, boosts=idx.boosts)
    return searcher.search_terms(BM25_AND_TERMS, k=10, mode="and", round_dp=6)


def q_bm25_wand_or(spark, sf_dir):
    documents = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(documents)
    segs = build_segments(idx.postings, idx.dstats, idx.cstats, num_shards=3)
    searcher = SegmentSearcher(segs, idx.tstats, idx.cstats, boosts=idx.boosts)
    return searcher.search_terms(BM25_OR_TERMS, k=10, mode="or", round_dp=6)


def q_exact_dedup(spark, sf_dir):
    """F2/F3 content-identity dedup: hash-groupBy, keep min id."""
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash (16 perms, md5 string-min) + 4-band LSH candidate pairs."""
    return lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard ≥ 0.5 pairs via shingle-inverted self-join."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.5)


JACCARD_DF_CAP = 5


def q_ngram_jaccard_capped(spark, sf_dir):
    """The 100 TB variant of exact Jaccard: boilerplate shingles (document
    frequency > cap) are dropped from the shingle SPACE before the inverted
    self-join, bounding every bucket — exact Jaccard of the capped
    representation, replayed identically by the oracle (at sf0.01 the cap
    really drops shingles: max df is 7, cap 5)."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), 0.5, max_shingle_df=JACCARD_DF_CAP
    )


def q_simhash_fingerprints(spark, sf_dir):
    """60-bit SimHash per doc (tf-weighted bit votes, md5-derived term bits)."""
    return simhash(load_table(spark, sf_dir, "documents"))


# deterministic near-dup corpus for the SimHash PAIR path: every 10th doc is
# re-added with its tail truncated — tf barely changes, so the fingerprints
# land within a small hamming radius; both sides replay the same derivation
SIMHASH_PAIR_HAMMING = 8
SIMHASH_DUP_MOD = 10
SIMHASH_DUP_OFFSET = 100000
SIMHASH_DUP_TRUNC = 40


def q_simhash_hamming_pairs(spark, sf_dir):
    """The SimHash SCALE path oracle-checked end-to-end: pigeonhole chunk
    banding (9 chunks × 6 bits for radius 8) → bucket-local candidate join →
    exact hamming verify via xor+popcount. The DuckDB oracle replays banding
    and verification exactly."""
    from ucuddle_search_engine_spark.operators.dedup import simhash_neardup_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % SIMHASH_DUP_MOD == 0).select(
        (F.col("doc_id") + SIMHASH_DUP_OFFSET).alias("doc_id"),
        F.expr(f"substring(text, 1, greatest(length(text) - {SIMHASH_DUP_TRUNC}, 1))").alias("text"),
    )
    src = docs.unionByName(dups)
    pairs = simhash_neardup_pairs(src, max_hamming=SIMHASH_PAIR_HAMMING)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))


def _simhash_pairs_sql() -> str:
    n_chunks = SIMHASH_PAIR_HAMMING + 1
    chunk_bits = 60 // n_chunks
    mask = (1 << chunk_bits) - 1
    return f"""
        WITH src AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {SIMHASH_DUP_OFFSET},
                 substring(text, 1, greatest(length(text) - {SIMHASH_DUP_TRUNC}, 1))
          FROM documents WHERE doc_id % {SIMHASH_DUP_MOD} = 0
        ),
        toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term FROM src),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        h AS (
          SELECT doc_id, tf, CAST(('0x' || substring(md5(term), 1, 15)) AS BIGINT) AS h FROM tf
        ),
        votes AS (
          SELECT doc_id, b.bit,
                 sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS v
          FROM h CROSS JOIN (SELECT range AS bit FROM range(60)) b
          GROUP BY doc_id, b.bit
        ),
        sim AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END)
                      AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id
        ),
        keyed AS (
          SELECT doc_id, simhash, c.chunk,
                 (simhash >> (c.chunk * {chunk_bits})) & {mask} AS cval
          FROM sim CROSS JOIN (SELECT range AS chunk FROM range({n_chunks})) c
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS sa, b.simhash AS sb
          FROM keyed a
          JOIN keyed b ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_PAIR_HAMMING}
    """


EMB_NEARDUP_THRESHOLD = 0.35  # synthetic embeddings top out at cos≈0.51; this keeps the result non-trivial


def q_embedding_neardup_pairs(spark, sf_dir):
    """Cosine ≥ τ near-dup pairs over the embeddings table."""
    return embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"), EMB_NEARDUP_THRESHOLD)


EMB_DIM = 64  # testdata embeddings dim (constant across SFs)


def q_embedding_neardup_bucketed(spark, sf_dir):
    """The 100 TB near-dup path, oracle-checked: banded hyperplane LSH
    (8 tables × 3 sign bits from seed-42 planes) → bucket-local candidate
    join → exact cosine verify. The DuckDB oracle replays the identical
    pipeline with the planes rendered as SQL literals, so the scale path —
    not just the all-pairs oracle variant — is machine-checked."""
    return embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), EMB_NEARDUP_THRESHOLD, bucketed=True
    )


def _emb_bucketed_sql(n_tables: int = 8, bits_per_table: int = 3) -> str:
    from ucuddle_search_engine_spark.operators.ann import _planes

    planes = _planes(EMB_DIM, n_tables * bits_per_table)
    sig_terms = "\n                 + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in p)}]) > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    )
    mask = (1 << bits_per_table) - 1
    keys = "\n          UNION ALL ".join(
        f"SELECT vec_id, {t} AS table_id, (sig >> {t * bits_per_table}) & {mask} AS bucket FROM sigs"
        for t in range(n_tables)
    )
    return f"""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
          FROM embeddings
        ),
        sigs AS (SELECT vec_id, {sig_terms} AS sig FROM n),
        keyed AS ({keys}),
        cand AS (
          SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
          FROM keyed a
          JOIN keyed b ON a.table_id = b.table_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT doc_a, doc_b,
               CAST(round(list_dot_product(na.v, nb.v) / (na.norm * nb.norm), 6) AS DOUBLE) AS cosine
        FROM cand
        JOIN n na ON na.vec_id = doc_a
        JOIN n nb ON nb.vec_id = doc_b
        WHERE list_dot_product(na.v, nb.v) / (na.norm * nb.norm) >= {EMB_NEARDUP_THRESHOLD}
    """


ANN_QUERY_VEC_ID = 0


def _ann_query_vec(emb) -> list[float]:
    row = emb.filter(F.col("vec_id") == ANN_QUERY_VEC_ID).select("embedding").first()
    if row is None:
        raise ValueError(f"embeddings table has no vec_id={ANN_QUERY_VEC_ID} "
                         "query vector (regenerated fixture with different ids?)")
    return [float(x) for x in row[0]]


def q_ann_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(emb, _ann_query_vec(emb), k=10)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN, oracle-checked end-to-end: pre-trained centroid PARAMETERS
    (operators/ivf_params.py, the FAISS ship-the-quantizer pattern) → Arrow
    cell assignment → probe the 2 nearest cells → exact cosine top-k inside
    them. The DuckDB oracle replays assignment/probing/scoring from the same
    centroid literals, so the IVF scale path is machine-checked, not just
    pytest-gated."""
    from ucuddle_search_engine_spark.operators.ann import IVFIndex
    from ucuddle_search_engine_spark.operators.ivf_params import IVF_CENTROIDS

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex(emb, n_probe=2, centroids=IVF_CENTROIDS)
    return idx.topk(_ann_query_vec(emb), k=10)


def _ann_ivf_sql(n_probe: int = 2, k: int = 10) -> str:
    from ucuddle_search_engine_spark.operators.ivf_params import IVF_CENTROIDS

    vals = ",\n               ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(IVF_CENTROIDS)
    )
    return f"""
        WITH cents(cell, c) AS (VALUES {vals}),
        q AS (
          SELECT CAST(embedding AS DOUBLE[]) AS qv,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS qn
          FROM embeddings WHERE vec_id = {ANN_QUERY_VEC_ID}
        ),
        probes AS (
          SELECT cell FROM cents CROSS JOIN q
          ORDER BY list_dot_product(c, q.qv) DESC, cell ASC LIMIT {n_probe}
        ),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), c.c) DESC, c.cell ASC) AS rn
            FROM embeddings e CROSS JOIN cents c
          ) WHERE rn = 1
        )
        SELECT e.vec_id,
               CAST(round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * q.qn), 6)
                    AS DOUBLE) AS cosine
        FROM embeddings e
        JOIN assign a ON a.vec_id = e.vec_id
        CROSS JOIN q
        WHERE a.cell IN (SELECT cell FROM probes)
        ORDER BY cosine DESC, e.vec_id ASC LIMIT {k}
    """


def q_text_stats(spark, sf_dir):
    """Language-ID + quality + token count + fingerprint per document."""
    return text_stats(load_table(spark, sf_dir, "documents"))


PHRASE = ["spark", "window"]


def q_phrase_match(spark, sf_dir):
    """Exact phrase occurrence count per doc from stored token positions
    (positions kept per schema K6; ES's quoted-query capability)."""
    from ucuddle_search_engine_spark.operators.phrase import phrase_match

    documents = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(documents)
    return phrase_match(idx.postings, PHRASE)


def q_phrase_search_topk(spark, sf_dir):
    """BM25-scored quoted-phrase top-10 (Lucene PhraseQuery semantics: the
    phrase scores as one pseudo-term with tf = phrase_tf, df = matching
    docs) — the ranked form of phrase_match, the semantics both the
    distributed and the serving-tier phrase engines are parity-tested
    against (operators/phrase.py)."""
    from ucuddle_search_engine_spark.operators.phrase import phrase_search

    documents = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(documents)
    # round_dp=6: round BEFORE the orderBy/limit cut (the oracle rounds
    # inside its CTE), so k-boundary ties break by doc_id on both sides
    return phrase_search(idx.postings, idx.dstats, idx.cstats, PHRASE, k=10,
                         round_dp=6)


PR_ITERS = 5


def _event_graph(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    edges = (
        events.select(
            (F.col("user_id") % 500).alias("src_doc_id"),
            (F.col("event_id") % 500).alias("dst_doc_id"),
        )
        .filter(F.col("src_doc_id") != F.col("dst_doc_id"))
        .dropDuplicates()
    )
    ids = spark.range(500).select(F.col("id").alias("doc_id"))
    return edges, ids


def q_pagerank(spark, sf_dir):
    """Iterative PageRank (5 fixed iterations, d=0.85, dangling redistributed)
    on a graph derived from events — oracle is 5 unrolled CTE levels."""
    edges, ids = _event_graph(spark, sf_dir)
    pr = pagerank(edges, ids, iterations=PR_ITERS)
    return pr.select("doc_id", F.round("pagerank", 9).alias("pagerank"))


def q_multimodal_features(spark, sf_dir):
    """Binary-payload plumbing, oracle-checked: deterministic fake feature
    extraction (16-bin byte-value histogram of the UTF-8 payload) through the
    REAL mapInPandas stage. The corpus is pure ASCII, so byte == code point
    and the whole histogram is DuckDB-replayable; the driver checks the raw
    integer counts plus n_bytes (the L1-normalized float form stays the
    pytest-covered API — JSON float formatting differs across engines).
    Media decode itself remains stubbed by design (no image libs in env)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_payload(docs), fake=True, normalize=False)
    counts = F.transform("feature", lambda x: x.cast("long"))
    return feats.select(
        "doc_id",
        F.to_json(counts).alias("feature_hist"),
        F.aggregate(counts, F.lit(0).cast("long"), lambda a, x: a + x).alias("n_bytes"),
    )


_MULTIMODAL_SQL = """
    WITH chars AS (
      SELECT doc_id, list_transform(regexp_extract_all(text, '[\\s\\S]'),
                                    c -> unicode(c) // 16) AS bins
      FROM documents
    )
    SELECT doc_id,
           to_json(list_transform(range(16),
                                  b -> len(list_filter(bins, x -> x = b)))) AS feature_hist,
           CAST(len(bins) AS BIGINT) AS n_bytes
    FROM chars
"""


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing, oracle-checked: every-2nd frame of a
    deterministic fake container (payload = UTF-8 text bytes, n_frames
    derived from length, EXACT integer chunk boundaries) through the REAL
    Arrow mapInPandas fan-out stage (operators/multimodal.sample_frames —
    one input row yields multiple frames inside the batch; no explode, no
    shuffle). The corpus is pure ASCII so byte == char and the byte slices
    replay as DuckDB string arithmetic; md5 over a frame's bytes matches
    md5 of the same ASCII substring. The real demuxer (ffmpeg) stays a
    disclosed stub, exactly like the image decoder."""
    from ucuddle_search_engine_spark.operators.multimodal import (
        attach_fake_video,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_fake_video(docs), every=2, fake=True)
    return frames.select(
        "doc_id",
        "frame_no",
        F.length("frame").cast("long").alias("n_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


_FRAME_SAMPLE_SQL = """
WITH vid AS (
  SELECT doc_id, text, (length(text) % 7) + 2 AS n_frames, length(text) AS nb
  FROM documents
),
frames AS (
  SELECT doc_id, CAST(i AS INT) AS frame_no,
         substring(text, (i * nb) // n_frames + 1,
                   ((i + 1) * nb) // n_frames - (i * nb) // n_frames) AS frame
  FROM vid, UNNEST(range(n_frames)) AS t(i)
  WHERE i % 2 = 0
)
SELECT doc_id, frame_no, CAST(length(frame) AS BIGINT) AS n_bytes,
       md5(frame) AS frame_md5
FROM frames
"""


def _pagerank_sql(iters: int = PR_ITERS, n: int = 500, d: float = 0.85) -> str:
    """Unrolled power iteration as chained CTEs (machine-checkable oracle for
    the 'iterative, non-SQL-expressible' operator)."""
    base = f"""
edges AS (
  SELECT DISTINCT (user_id % {n}) AS src, (event_id % {n}) AS dst
  FROM events WHERE (user_id % {n}) <> (event_id % {n})
),
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
ids AS (SELECT range AS doc_id FROM range({n})),
r0 AS (SELECT doc_id, CAST(1.0/{n} AS DOUBLE) AS rank FROM ids)"""
    levels = [base]
    for i in range(iters):
        levels.append(f"""
d{i} AS (
  SELECT coalesce(sum(r.rank), 0.0) AS dang FROM r{i} r
  LEFT JOIN outdeg o ON r.doc_id = o.src WHERE o.src IS NULL
),
c{i} AS (
  SELECT e.dst AS doc_id, sum(r.rank / o.deg) AS contrib
  FROM r{i} r JOIN edges e ON r.doc_id = e.src JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
),
r{i + 1} AS (
  SELECT ids.doc_id,
         (1.0 - {d})/{n} + {d} * (coalesce(c{i}.contrib, 0.0) + d{i}.dang/{n}) AS rank
  FROM ids LEFT JOIN c{i} ON ids.doc_id = c{i}.doc_id CROSS JOIN d{i}
)""")
    return (
        "WITH " + ",".join(levels)
        + f"\nSELECT doc_id, CAST(round(rank, 9) AS DOUBLE) AS pagerank FROM r{iters}"
    )


def q_json_extract_props(spark, sf_dir):
    """C8: JSON decode at the API edge (from_json) — per-event-type stats of
    the props payload (jsonpickle/json.Marshal analogue)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_type", F.from_json("props", "k int").alias("p"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("p.k")), 6).alias("avg_k"),
            F.max(F.col("p.k")).alias("max_k"),
        )
    )


def q_rollup_revenue(spark, sf_dir):
    """Hierarchical totals via ROLLUP (nation → grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey).join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    return (
        joined.rollup("n_name", "o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            "revenue",
            "n_orders",
        )
    )


HIGHLIGHT_TERMS = ["spark", "window"]


def q_search_highlight(spark, sf_dir):
    """Full read path with snippets (C7). The oracle-checkable part — top-k
    ids, scores, and the merged match POSITIONS (both sides share the
    tokenizer, so positions are SQL-derivable) — is returned; the rendered
    snippet text is engine-defined and pinned by tests/test_highlight.py
    instead. match_positions ships as JSON for the driver's canonicalizer."""
    from ucuddle_search_engine_spark.operators.highlight import highlight_hits

    documents = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(documents)
    topk = idx.search_terms(HIGHLIGHT_TERMS, k=10, mode="and", round_dp=6)
    hits = highlight_hits(topk, idx.docs, idx.postings, HIGHLIGHT_TERMS, keep_positions=True)
    return hits.select(
        "doc_id", "score", F.to_json("match_positions").alias("match_positions")
    )


def _search_highlight_sql(k: int = 10) -> str:
    tlist = ", ".join(f"'{t}'" for t in sorted(set(HIGHLIGHT_TERMS)))
    nterms = len(set(HIGHLIGHT_TERMS))
    return f"""
WITH toks AS ({TOKS_SQL}),
{_bm25_score_ctes(tlist, with_nterms=True)},
topk AS (
  SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score
  FROM scored WHERE nterms = {nterms}
  ORDER BY score DESC, doc_id ASC LIMIT {k}
),
tp AS (
  SELECT doc_id, u.term AS term, u.pos AS pos FROM (
    SELECT doc_id,
           unnest(list_transform(range(len(t)), i -> {{'term': t[i+1], 'pos': i}})) AS u
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t FROM documents)
  )
),
mp AS (
  SELECT doc_id, to_json(list_sort(list(pos))) AS match_positions
  FROM tp
  WHERE term IN ({tlist}) AND doc_id IN (SELECT doc_id FROM topk)
  GROUP BY doc_id
)
SELECT t.doc_id, t.score, m.match_positions
FROM topk t JOIN mp m USING (doc_id)
"""


INGEST_EPOCH0 = 1704067200  # 2024-01-01T00:00:00Z
INGEST_SINCE_S = 300


def q_docs_added_since(spark, sf_dir):
    """Time-windowed maintenance read (C10: the reference stamps
    added_at_time on every ingested doc, crawler/functs_with_elastic.go:311):
    'docs added since X' over the stamped docs table. Stamping here is
    deterministic (epoch0 + doc_id seconds) so the oracle replays it; the
    filter itself runs on the TIMESTAMP-typed added_at column exactly as the
    admin `since` verb does against a written store."""
    docs = load_table(spark, sf_dir, "documents")
    stamped = docs.withColumn(
        "added_at", F.timestamp_seconds(F.lit(INGEST_EPOCH0) + F.col("doc_id"))
    )
    since = F.timestamp_seconds(F.lit(INGEST_EPOCH0 + INGEST_SINCE_S))
    return (
        stamped.filter(F.col("added_at") >= since)
        .select("doc_id", F.unix_timestamp("added_at").alias("added_at_epoch"))
    )


# ---- training-corpus preparation ops (operators/corpus) -------------------

SAMPLE_FRACTIONS = {"en": 0.5, "de": 1.0, "zh": 0.25}
PACK_BUDGET = 2000
PACK_BUCKET = 100
DECONTAM_N = 8
DECONTAM_MOD = 97


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-mod stratified sampling — the training-mix
    balancer (en@50%, de@100%, zh@25%; other strata dropped)."""
    from ucuddle_search_engine_spark.operators.corpus import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, SAMPLE_FRACTIONS).select("doc_id", "lang")


def q_unigram_logprob(spark, sf_dir):
    """Perplexity-proxy quality score: mean ln(corpus unigram prob) per doc."""
    from ucuddle_search_engine_spark.operators.corpus import unigram_logprob

    return unigram_logprob(load_table(spark, sf_dir, "documents"))


def q_token_pack(spark, sf_dir):
    """Sequence packing: concat-in-id-order → chunk into 2000-token packs
    (two-phase distributed prefix sum, never a global window)."""
    from ucuddle_search_engine_spark.operators.corpus import pack_documents

    docs = load_table(spark, sf_dir, "documents")
    return pack_documents(docs, budget=PACK_BUDGET, bucket_size=PACK_BUCKET)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs sharing an 8-gram with a benchmark set
    (derived deterministically: 13 tokens from every 97th doc) are flagged
    with their shared-shingle count."""
    from ucuddle_search_engine_spark.operators.corpus import ngram_overlap_flags

    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
    bench = docs.filter(F.col("doc_id") % DECONTAM_MOD == 0).select(
        F.concat_ws(" ", F.slice(toks, 11, 13)).alias("text")
    )
    return ngram_overlap_flags(docs, bench, n=DECONTAM_N)


def _stratified_sample_sql() -> str:
    from ucuddle_search_engine_spark.operators.corpus import SAMPLE_MOD

    cases = " ".join(
        f"WHEN lang = '{s}' THEN {int(f * SAMPLE_MOD)}"
        for s, f in sorted(SAMPLE_FRACTIONS.items())
    )
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % {SAMPLE_MOD}) < CASE {cases} ELSE 0 END
    """


_UNIGRAM_LOGPROB_SQL = f"""
    WITH toks AS ({TOKS_SQL}),
    uni AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM toks)
    SELECT doc_id, count(*) AS n_tokens,
           CAST(round(avg(ln(n / n_total)), 6) AS DOUBLE) AS avg_logprob
    FROM toks JOIN uni USING (term) CROSS JOIN tot
    GROUP BY doc_id
"""


def _token_pack_sql() -> str:
    from ucuddle_search_engine_spark.functions.textstats import BPE_PATTERN

    bpe = BPE_PATTERN.replace("'", "''")
    return f"""
        WITH t AS (
          SELECT doc_id, CAST(len(regexp_extract_all(text, '{bpe}')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        c AS (
          SELECT doc_id, n_tokens,
                 coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
          FROM t
        )
        SELECT doc_id, n_tokens, CAST(pre // {PACK_BUDGET} AS BIGINT) AS pack_id FROM c
    """


_DECONTAM_SQL = f"""
    WITH t0 AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t FROM documents),
    bench AS (
      SELECT regexp_extract_all(lower(array_to_string(t[11:23], ' ')), '{TOKEN_PATTERN}') AS t
      FROM t0 WHERE doc_id % {DECONTAM_MOD} = 0
    ),
    dsh AS (
      SELECT DISTINCT doc_id, {_shingle_expr(DECONTAM_N)}
      FROM t0
    ),
    bsh AS (
      SELECT DISTINCT {_shingle_expr(DECONTAM_N)}
      FROM bench
    )
    SELECT doc_id, count(*) AS n_shared
    FROM dsh JOIN bsh USING (shingle)
    GROUP BY doc_id
"""


SESSION_GAP_S = 1800


def q_sessionize_events(spark, sf_dir):
    """Sessionization: lag-gap flag + running sum over a user window → session
    stats. The gap test is an interval comparison on TIMESTAMP_NTZ — timezone-
    independent, so Spark and DuckDB agree regardless of session TZ."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.col("ts") - F.lag("ts").over(w) > F.expr(f"INTERVAL {SESSION_GAP_S} SECONDS"), 1
        ).otherwise(F.lit(0)).cast("int"),
    ).withColumn("session_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return flagged.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def q_pivot_lineitem(spark, sf_dir):
    """Pivot: quantity by returnflag × linestatus as columns."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 6))
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_o"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_f"),
    )


PMI_MIN_COUNT = 8


def q_bigram_pmi(spark, sf_dir):
    """Collocation mining: pointwise mutual information over adjacent token
    pairs (phrase-vocabulary induction for tokenizer/corpus work).

    Adjacent pairs are a PER-ROW array operation — zip_with over two slices of
    the token array → one explode, one groupBy, ZERO self-joins (the previous
    posexplode + (doc_id, pos+1) self-join shuffled the whole token stream
    twice). Both normalization totals come from ONE 1-row aggregate over the
    same scan (Σlen and Σmax(len−1,0)) broadcast-cross-joined in — no
    mid-plan driver actions, the whole query is a single declarative plan."""
    docs = load_table(spark, sf_dir, "documents")
    tok_arr = F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
    base = docs.select(tok_arr.alias("t"))
    n_pairs = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = base.select(
        F.explode(
            F.zip_with(
                F.slice("t", F.lit(1), n_pairs),
                F.slice("t", F.lit(2), n_pairs),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_ab"))
    uni = base.select(F.explode("t").alias("term")).groupBy("term").agg(F.count("*").alias("n"))
    # Σn_ab == Σmax(len−1, 0) by construction, so both totals fall out of the
    # base scan — 1 row, broadcast
    totals = base.agg(
        F.sum(F.size("t")).cast("double").alias("n_toks"),
        F.sum(n_pairs).cast("double").alias("n_bi"),
    )
    return (
        bigrams.filter(F.col("n_ab") >= PMI_MIN_COUNT)
        .join(uni.select(F.col("term").alias("w1"), F.col("n").alias("n1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("n").alias("n2")), "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.round(
                F.log((F.col("n_ab") / F.col("n_bi"))
                      / ((F.col("n1") / F.col("n_toks")) * (F.col("n2") / F.col("n_toks")))),
                6,
            ),
        )
        .select("w1", "w2", "n_ab", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


def _bigram_pmi_sql() -> str:
    return f"""
        WITH t0 AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t FROM documents),
        toks AS (
          SELECT doc_id, u.term AS term, u.pos AS pos FROM (
            SELECT doc_id,
                   unnest(list_transform(range(len(t)), i -> {{'term': t[i+1], 'pos': i}})) AS u
            FROM t0
          )
        ),
        big AS (
          SELECT a.term AS w1, b.term AS w2, count(*) AS n_ab
          FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          GROUP BY a.term, b.term
        ),
        uni AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_toks FROM toks),
        totb AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS n_bi FROM big)
        SELECT w1, w2, n_ab,
               CAST(round(ln((n_ab / totb.n_bi) / ((u1.n / tot.n_toks) * (u2.n / tot.n_toks))), 6) AS DOUBLE) AS pmi
        FROM big
        JOIN uni u1 ON w1 = u1.term
        JOIN uni u2 ON w2 = u2.term
        CROSS JOIN tot CROSS JOIN totb
        WHERE n_ab >= {PMI_MIN_COUNT}
        ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
    """


def q_training_corpus_filter(spark, sf_dir):
    """The composed training-data gate a 100 TB pipeline runs end-to-end:
    language filter + quality score + token-length band (functions/textstats),
    then canonical-fingerprint dedup keeping the lowest doc id — one
    declarative plan, no intermediate materialization."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text_stats(docs)
    keep = stats.filter(
        (F.col("lang_pred") == "en")
        & (F.col("quality") >= 0.6)
        & (F.col("n_tokens").between(20, 10000))
    )
    return keep.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_dups"),
    ).select("doc_id", "fingerprint", "n_dups")


def _training_filter_sql() -> str:
    return f"""
        WITH stats AS ({_TEXT_STATS_SQL})
        SELECT min(doc_id) AS doc_id, fingerprint, count(*) AS n_dups
        FROM stats
        WHERE lang_pred = 'en' AND quality >= 0.6 AND n_tokens BETWEEN 20 AND 10000
        GROUP BY fingerprint
    """


def q_dedup_components(spark, sf_dir):
    """Near-dup pairs → transitive dedup clusters (iterative min-label
    propagation; oracle = DuckDB RECURSIVE CTE reachability)."""
    from ucuddle_search_engine_spark.operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, 0.5)
    return connected_components(pairs)


def _components_sql() -> str:
    return f"""
        WITH RECURSIVE {_SHINGLES_SQL},
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        edges AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
        ),
        und AS (
          SELECT doc_a AS s, doc_b AS d FROM edges
          UNION SELECT doc_b, doc_a FROM edges
        ),
        reach AS (
          SELECT s AS n, s AS m FROM und
          UNION
          SELECT r.n, u.d FROM reach r JOIN und u ON r.m = u.s
        )
        SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
    """


def q_token_counts(spark, sf_dir):
    """LLM token budgeting over the corpus: whitespace count, analyzer count,
    and a BPE-ish pre-tokenizer piece count — all regex Column expressions."""
    from ucuddle_search_engine_spark.functions.textstats import (
        bpe_token_count,
        token_count,
        ws_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ws_token_count("text").alias("ws_tokens"),
        token_count("text").alias("re_tokens"),
        bpe_token_count("text").alias("bpe_tokens"),
    )


def _token_counts_sql() -> str:
    from ucuddle_search_engine_spark.functions.textstats import BPE_PATTERN

    bpe = BPE_PATTERN.replace("'", "''")
    return f"""
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
               len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS re_tokens,
               len(regexp_extract_all(text, '{bpe}')) AS bpe_tokens
        FROM documents
    """


def q_paged_search(spark, sf_dir):
    """Result pagination (web/app.py:43 more_links; ES from+size): page 2
    (offset 10, size 10) of the disjunctive ranking."""
    documents = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(documents)
    return idx.search_terms(BM25_OR_TERMS, k=10, mode="or", round_dp=6, offset=10)


def _paged_sql() -> str:
    return _bm25_sql(BM25_OR_TERMS, "or", k=10, offset=10)


FUZZY_TERMS = ["windoq", "strem"]  # typos of corpus terms (window, stream)


def q_fuzzy_match(spark, sf_dir):
    """fuzziness:AUTO (web_old/elastic_interaction.py:23): expand each query
    term to dictionary terms within its AUTO edit distance, score the expanded
    set as a BM25 OR-group. Uncapped expansions so the oracle is exact."""
    from ucuddle_search_engine_spark.operators.fuzzy import fuzzy_search

    docs = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(docs)
    return fuzzy_search(idx, FUZZY_TERMS, k=10, max_expansions=None, round_dp=6)


def q_fuzzy_match_prefix(spark, sf_dir):
    """fuzziness:AUTO with prefix_length=1 (the ES knob for huge
    vocabularies): candidates must share the query term's first character
    exactly, so over a written store the dictionary scan reads only the
    stored-p1 first-char bands (pushed filter; tests/test_plans.py asserts
    it). Uncapped expansions so the oracle is exact."""
    from ucuddle_search_engine_spark.operators.fuzzy import fuzzy_search

    docs = load_table(spark, sf_dir, "documents")
    idx = InvertedIndex.from_documents_table(docs)
    return fuzzy_search(idx, FUZZY_TERMS, k=10, max_expansions=None, round_dp=6,
                        prefix_length=1)


def _fuzzy_sql(k: int = 10, prefix_length: int = 0) -> str:
    vals = ", ".join(f"('{t}')" for t in FUZZY_TERMS)
    pre = (
        f"AND substring(v.term, 1, {prefix_length}) = substring(qs.qterm, 1, {prefix_length})"
        if prefix_length >= 1 else ""
    )
    return f"""
WITH toks AS ({TOKS_SQL}),
vocab AS (SELECT DISTINCT term FROM toks),
qs(qterm) AS (VALUES {vals}),
expand AS (
  SELECT DISTINCT v.term FROM vocab v JOIN qs ON
    abs(length(v.term) - length(qs.qterm)) <=
      (CASE WHEN length(qs.qterm) < 3 THEN 0 WHEN length(qs.qterm) <= 5 THEN 1 ELSE 2 END)
    AND levenshtein(v.term, qs.qterm) <=
      (CASE WHEN length(qs.qterm) < 3 THEN 0 WHEN length(qs.qterm) <= 5 THEN 1 ELSE 2 END)
    {pre}
),
{_bm25_score_ctes("SELECT term FROM expand")}
SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


ROUTED_QUERY = "the windows and streams for customers"


def q_lang_routed_search(spark, sf_dir):
    """The reference's read-path branch: detect the query language
    (web/app.py:33) and route to the per-language index built with that
    language's stop+stem analyzer (web/elastic_interaction.py:53-57,
    crawler/functs_with_elastic.go:136-157). The routed query here is
    English: stopwords drop, plurals stem, BM25 stats are per-lang."""
    docs = load_table(spark, sf_dir, "documents")
    router = LangRoutedIndex(docs)
    return router.search(ROUTED_QUERY, k=10, mode="or", round_dp=6)


# Deterministic mixed-language corpus for the Cyrillic routing check: every
# 5th doc transliterated letter-for-letter to Cyrillic (word structure
# survives) with a Russian-stopword prefix, so the stopword vote assigns it
# 'ru' — both sides (Spark and the DuckDB oracle) derive the same corpus from
# `documents`; no external data.
RU_TRANSLIT_SRC = "abcdefghijklmnopqrstuvwxyz"
RU_TRANSLIT_DST = "абвгдежзийклмнопрстуфхцчшщ"
RU_STOP_PREFIX = "и что он как с ты же мне "
CYR_DOC_MOD = 5
CYRILLIC_QUERY = "как " + "spark window".translate(
    str.maketrans(RU_TRANSLIT_SRC, RU_TRANSLIT_DST))


def _mixed_lang_docs(docs):
    is_ru = (F.col("doc_id") % CYR_DOC_MOD) == 0
    ru_text = F.concat(
        F.lit(RU_STOP_PREFIX),
        F.translate(F.lower("text"), RU_TRANSLIT_SRC, RU_TRANSLIT_DST),
    )
    return docs.withColumn("text", F.when(is_ru, ru_text).otherwise(F.col("text")))


_MIXED_DOCS_SQL = (
    "SELECT doc_id, CASE WHEN doc_id % {m} = 0 THEN '{p}' || "
    "translate(lower(text), '{s}', '{d}') ELSE text END AS text FROM documents"
).format(m=CYR_DOC_MOD, p=RU_STOP_PREFIX, s=RU_TRANSLIT_SRC, d=RU_TRANSLIT_DST)


def q_lang_routed_search_cyrillic(spark, sf_dir):
    """The reference's PRIMARY read path: a Cyrillic (Russian) query detected
    by the stopword vote (web/app.py:33 langdetect) and routed to the ru
    index built with the russian stop+stem analyzer
    (web/elastic_interaction.py:53-57, crawler/functs_with_elastic.go:136-157)
    over a mixed en/ru corpus."""
    docs = _mixed_lang_docs(load_table(spark, sf_dir, "documents"))
    router = LangRoutedIndex(docs)
    return router.search(CYRILLIC_QUERY, k=10, mode="or", round_dp=6)


# the most common real query shape: 2-3 content words, ZERO stopwords — the
# stopword vote is blind to it, so routing rides on the charset prior
# (textstats.charset_prior), exactly what the reference's n-gram langdetect
# does for such queries (web/app.py:33)
NOSTOP_QUERY = "spark window".translate(str.maketrans(RU_TRANSLIT_SRC, RU_TRANSLIT_DST))


def q_lang_routed_search_nostop(spark, sf_dir):
    """Stopword-free Cyrillic query routed by the charset prior to the ru
    store (shared-alphabet text with no uk marks falls to ru — the
    reference's default store, web/elastic_interaction.py:53-57) and scored
    with the russian analyzer's BM25 over the ru subset."""
    docs = _mixed_lang_docs(load_table(spark, sf_dir, "documents"))
    router = LangRoutedIndex(docs)
    if detect_lang(NOSTOP_QUERY) != "ru":  # the prior, not the vote
        # a hard error, not assert: the oracle hardcodes lang='ru', and
        # python -O would strip an assert — a stopword/prior change that
        # flips detection must fail HERE, not as a confusing hash mismatch
        raise ValueError("detect_lang(NOSTOP_QUERY) no longer routes to ru; "
                         "update the lang_routed_search_nostop oracle")
    return router.search(NOSTOP_QUERY, k=10, mode="or", round_dp=6)


def _lang_routed_sql(k: int = 10, lang: str = "en", query: str | None = None,
                     docs_sql: str = "SELECT doc_id, text FROM documents") -> str:
    from ucuddle_search_engine_spark.functions.analyze import ANALYZERS
    from ucuddle_search_engine_spark.functions.textstats import (
        STOPWORDS, VOTE_TOKEN_PATTERN, charset_prior_sql)

    an = ANALYZERS[lang]
    terms = sorted(set(an.analyze_py(query if query is not None else ROUTED_QUERY)))
    tlist = ", ".join(f"'{t}'" for t in terms)
    langs = sorted(STOPWORDS)
    hits = ",\n                     ".join(
        f"len(list_intersect(rawtoks, [{', '.join(repr(w) for w in STOPWORDS[lang])}])) AS hits_{lang}"
        for lang in langs
    )
    best = f"greatest({', '.join('hits_' + lang for lang in langs)})"
    n_at_max = " + ".join(f"CASE WHEN hits_{lang} = {best} THEN 1 ELSE 0 END" for lang in langs)
    pick = " ".join(f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang in langs)
    prior = charset_prior_sql("text")
    return f"""
WITH docs_src AS ({docs_sql}),
base AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '{VOTE_TOKEN_PATTERN}') AS rawtoks
  FROM docs_src
),
hits AS (
  SELECT doc_id, text,
                     {hits}
  FROM base
),
endocs AS (
  SELECT doc_id, text FROM hits
  WHERE CASE WHEN {best} > 0 AND ({n_at_max}) = 1
             THEN CASE {pick} END ELSE {prior} END = '{lang}'
),
toks AS (
  SELECT doc_id, unnest({an.tokens_sql('text')}) AS term FROM endocs
),
{_bm25_score_ctes(tlist)}
SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def q_snowball_stems(spark, sf_dir):
    """Snowball russian stemming over the derived Cyrillic corpus (the same
    deterministic transliteration the routing check uses): top stem counts.
    The reference's ES indexes stem with russian_stemmer
    (crawler/functs_with_elastic.go:142-145); the oracle replays the FULL
    algorithm through its DuckDB SQL rendering (functions/snowball.py), so
    every region rule and ending table is machine-checked on corpus data."""
    from ucuddle_search_engine_spark.functions.analyze import ANALYZERS

    docs = _mixed_lang_docs(load_table(spark, sf_dir, "documents")).filter(
        (F.col("doc_id") % CYR_DOC_MOD) == 0
    )
    an = ANALYZERS["ru"]
    return (
        docs.select(F.explode(an.tokens_col("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(50)
    )


def _snowball_stems_sql(k: int = 50) -> str:
    from ucuddle_search_engine_spark.functions.analyze import ANALYZERS

    an = ANALYZERS["ru"]
    return f"""
WITH docs_src AS ({_MIXED_DOCS_SQL}),
ru AS (SELECT text FROM docs_src WHERE doc_id % {CYR_DOC_MOD} = 0),
toks AS (SELECT unnest({an.tokens_sql('text')}) AS term FROM ru)
SELECT term, count(*) AS n FROM toks
GROUP BY term ORDER BY n DESC, term ASC LIMIT {k}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk_and": q_bm25_topk_and,
        "bm25_topk_or": q_bm25_topk_or,
        "term_stats_top": q_term_stats_top,
        "doc_stats": q_doc_stats,
        "max_doc_id": q_max_doc_id,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_nation_revenue": q_join_nation_revenue,
        "topk_orders": q_topk_orders,
        "window_latest_event": q_window_latest_event,
        "semi_join_active_customers": q_semi_join_active_customers,
        "anti_join_inactive_customers": q_anti_join_inactive_customers,
        "work_queue_fetch": q_work_queue_fetch,
        "filter_lang_minlen": q_filter_lang_minlen,
        "bm25_wand_and": q_bm25_wand_and,
        "bm25_wand_or": q_bm25_wand_or,
        "exact_dedup": q_exact_dedup,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        # registry capped at 50 entries: the round-5 driver harness sampled
        # 50 of 52 and silently dropped the rest. ngram_jaccard_pairs (exact,
        # uncapped) and simhash_fingerprints are folded out — their semantics
        # stay pinned by tests/test_ann_dedup.py (test_jaccard_pairs_exact,
        # test_simhash_bits_and_neardups) and their production forms remain
        # oracle-checked here (ngram_jaccard_capped, simhash_hamming_pairs,
        # which computes the fingerprints internally).
        # HEADROOM PROTOCOL (r7): if the driver's cap ever rises, re-admit
        # folded-out queries in THIS order (tests/test_registry.py asserts
        # the listed functions exist and stay runnable):
        #   1. q_ngram_jaccard_pairs   (exact-Jaccard oracle of the capped form)
        #   2. q_simhash_fingerprints  (raw fingerprints behind hamming_pairs)
        "ngram_jaccard_capped": q_ngram_jaccard_capped,
        "simhash_hamming_pairs": q_simhash_hamming_pairs,
        "embedding_neardup_pairs": q_embedding_neardup_pairs,
        "embedding_neardup_bucketed": q_embedding_neardup_bucketed,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "text_stats": q_text_stats,
        "pagerank": q_pagerank,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "phrase_match": q_phrase_match,
        "phrase_search_topk": q_phrase_search_topk,
        "json_extract_props": q_json_extract_props,
        "rollup_revenue": q_rollup_revenue,
        "search_highlight": q_search_highlight,
        "sessionize_events": q_sessionize_events,
        "docs_added_since": q_docs_added_since,
        "stratified_sample": q_stratified_sample,
        "unigram_logprob": q_unigram_logprob,
        "token_pack": q_token_pack,
        "decontaminate": q_decontaminate,
        "pivot_lineitem": q_pivot_lineitem,
        "lang_routed_search": q_lang_routed_search,
        "lang_routed_search_cyrillic": q_lang_routed_search_cyrillic,
        "lang_routed_search_nostop": q_lang_routed_search_nostop,
        "snowball_stems": q_snowball_stems,
        "fuzzy_match": q_fuzzy_match,
        "fuzzy_match_prefix": q_fuzzy_match_prefix,
        "paged_search": q_paged_search,
        "token_counts": q_token_counts,
        "dedup_components": q_dedup_components,
        "training_corpus_filter": q_training_corpus_filter,
        "bigram_pmi": q_bigram_pmi,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_and": _bm25_sql(BM25_AND_TERMS, "and"),
        "bm25_topk_or": _bm25_sql(BM25_OR_TERMS, "or"),
        "lang_routed_search": _lang_routed_sql(),
        "lang_routed_search_cyrillic": _lang_routed_sql(
            lang="ru", query=CYRILLIC_QUERY, docs_sql=_MIXED_DOCS_SQL),
        "lang_routed_search_nostop": _lang_routed_sql(
            lang="ru", query=NOSTOP_QUERY, docs_sql=_MIXED_DOCS_SQL),
        "snowball_stems": _snowball_stems_sql(),
        "fuzzy_match": _fuzzy_sql(),
        "fuzzy_match_prefix": _fuzzy_sql(prefix_length=1),
        "paged_search": _paged_sql(),
        "token_counts": _token_counts_sql(),
        "dedup_components": _components_sql(),
        "training_corpus_filter": _training_filter_sql(),
        "bigram_pmi": _bigram_pmi_sql(),
        "term_stats_top": f"""
            WITH toks AS ({TOKS_SQL})
            SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
            FROM toks GROUP BY term
            ORDER BY df DESC, term ASC LIMIT 50
        """,
        "doc_stats": f"""
            WITH toks AS ({TOKS_SQL})
            SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id
        """,
        "max_doc_id": "SELECT max(doc_id) AS max_doc_id FROM documents",
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity), 6) AS DOUBLE) AS sum_qty,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue,
                   CAST(round(avg(l_discount), 6) AS DOUBLE) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_nation_revenue": """
            SELECT n_name,
                   CAST(round(sum(o_totalprice), 4) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "window_latest_event": """
            SELECT user_id, event_id, event_type,
                   CAST(round(value, 6) AS DOUBLE) AS value
            FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "semi_join_active_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "anti_join_inactive_customers": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "work_queue_fetch": """
            SELECT event_id, user_id, CAST(round(value, 6) AS DOUBLE) AS value
            FROM events
            WHERE event_type = 'click' AND value > 0
            ORDER BY event_id ASC LIMIT 100
        """,
        "filter_lang_minlen": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE lang IN ('en', 'de') AND n_chars > 200
        """,
        "bm25_wand_and": _bm25_sql(BM25_AND_TERMS, "and"),
        "bm25_wand_or": _bm25_sql(BM25_OR_TERMS, "or"),
        "exact_dedup": """
            SELECT md5(text) AS content_md5, min(doc_id) AS keep_doc_id, count(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "minhash_lsh_pairs": f"""
            WITH {_SHINGLES_SQL},
            sig AS (
              SELECT doc_id, h.hash_id, min(md5(shingle || ':' || h.hash_id)) AS minhash
              FROM sh CROSS JOIN (SELECT range AS hash_id FROM range(16)) h
              GROUP BY doc_id, h.hash_id
            ),
            banded AS (
              SELECT doc_id, band_id, md5(string_agg(minhash, '|' ORDER BY hash_id)) AS band_key
              FROM (SELECT doc_id, hash_id, minhash, CAST(hash_id // 4 AS INT) AS band_id FROM sig)
              GROUP BY doc_id, band_id
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        """,
        "ngram_jaccard_capped": f"""
            WITH {_SHINGLES_SQL},
            df AS (SELECT shingle, count(*) AS d FROM sh GROUP BY shingle),
            shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df USING (shingle)
                    WHERE df.d <= {JACCARD_DF_CAP}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS DOUBLE) AS jaccard
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
        """,
        "simhash_hamming_pairs": _simhash_pairs_sql(),
        "embedding_neardup_pairs": f"""
            WITH n AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
              FROM embeddings
            )
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   CAST(round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS DOUBLE) AS cosine
            FROM n a JOIN n b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= {EMB_NEARDUP_THRESHOLD}
        """,
        "embedding_neardup_bucketed": _emb_bucketed_sql(),
        "ann_ivf_topk": _ann_ivf_sql(),
        "ann_cosine_topk": f"""
            WITH q AS (
              SELECT CAST(embedding AS DOUBLE[]) AS qv,
                     sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS qn
              FROM embeddings WHERE vec_id = {ANN_QUERY_VEC_ID}
            )
            SELECT vec_id,
                   CAST(round(list_dot_product(CAST(embedding AS DOUBLE[]), q.qv)
                        / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * q.qn), 6)
                        AS DOUBLE) AS cosine
            FROM embeddings CROSS JOIN q
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "text_stats": _TEXT_STATS_SQL,
        "pagerank": _pagerank_sql(),
        "phrase_match": f"""
            WITH t0 AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t FROM documents),
            tp AS (
              SELECT doc_id, u.term AS term, u.pos AS pos FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(t)), i -> {{'term': t[i+1], 'pos': i}})) AS u
                FROM t0
              )
            )
            SELECT a.doc_id, count(*) AS phrase_tf
            FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
            GROUP BY a.doc_id
        """,
        "phrase_search_topk": f"""
            WITH t0 AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t FROM documents),
            tp AS (
              SELECT doc_id, u.term AS term, u.pos AS pos FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(t)), i -> {{'term': t[i+1], 'pos': i}})) AS u
                FROM t0
              )
            ),
            m AS (
              SELECT a.doc_id, CAST(count(*) AS DOUBLE) AS phrase_tf
              FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              WHERE a.term = '{PHRASE[0]}' AND b.term = '{PHRASE[1]}'
              GROUP BY a.doc_id
            ),
            dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS doclen FROM tp GROUP BY doc_id),
            coll AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doclen) AS avgdl FROM dl),
            dfp AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM m)
            SELECT m.doc_id AS doc_id,
                   CAST(round( ln(1.0 + (coll.n_docs - dfp.df + 0.5) / (dfp.df + 0.5))
                        * m.phrase_tf / (m.phrase_tf + {K1} * (1.0 - {B} + {B} * dl.doclen / coll.avgdl)), 6) AS DOUBLE) AS score
            FROM m JOIN dl ON m.doc_id = dl.doc_id CROSS JOIN coll CROSS JOIN dfp
            ORDER BY score DESC, m.doc_id ASC LIMIT 10
        """,
        "json_extract_props": """
            SELECT event_type, count(*) AS n,
                   CAST(round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS DOUBLE) AS avg_k,
                   max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
            FROM events GROUP BY event_type
        """,
        "rollup_revenue": """
            SELECT coalesce(n_name, 'ALL') AS n_name,
                   coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   CAST(round(sum(o_totalprice), 4) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP (n_name, o_orderstatus)
        """,
        # search_highlight: ids/scores/match POSITIONS oracle-checked (shared
        # tokenizer); the rendered snippet text is engine-defined and pinned
        # by tests/test_highlight.py.
        "search_highlight": _search_highlight_sql(),
        "docs_added_since": f"""
            SELECT doc_id, {INGEST_EPOCH0} + doc_id AS added_at_epoch
            FROM documents
            WHERE {INGEST_EPOCH0} + doc_id >= {INGEST_EPOCH0 + INGEST_SINCE_S}
        """,
        "stratified_sample": _stratified_sample_sql(),
        "unigram_logprob": _UNIGRAM_LOGPROB_SQL,
        "token_pack": _token_pack_sql(),
        "decontaminate": _DECONTAM_SQL,
        "sessionize_events": f"""
            WITH flagged AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_S} SECONDS
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
              SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
              FROM flagged
            )
            SELECT user_id, session_no, count(*) AS n_events,
                   CAST(round(sum(value), 6) AS DOUBLE) AS total_value
            FROM sess GROUP BY user_id, session_no
        """,
        "pivot_lineitem": """
            SELECT l_returnflag,
                   coalesce(CAST(round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 6) AS DOUBLE), 0.0) AS qty_o,
                   coalesce(CAST(round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 6) AS DOUBLE), 0.0) AS qty_f
            FROM lineitem GROUP BY l_returnflag
        """,
        # multimodal_features: the fake 16-bin byte histogram is fully
        # DuckDB-replayable over the ASCII corpus (byte == code point);
        # only the media DECODE stays stubbed (no image libs in env).
        "multimodal_features": _MULTIMODAL_SQL,
        "frame_sample": _FRAME_SAMPLE_SQL,
    }
