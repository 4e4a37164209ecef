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

from ucuddle_search_engine_spark.operators.bm25 import InvertedIndex
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
    out = idx.search_terms(terms, k=k, mode=mode)
    return out.select("doc_id", F.round(F.col("score"), 6).alias("score"))


def _bm25_sql(terms: list[str], mode: str, k: int = 10) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    nterms = len(terms)
    and_filter = f"WHERE nterms = {nterms}" if mode == "and" else ""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
coll AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doclen) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term IN ({tlist}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (coll.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doclen / coll.avgdl)) ) AS score,
         count(*) AS nterms
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN coll
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS score
FROM scored {and_filter}
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)).alias("term"),
    )


TOKS_SQL = f"SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term FROM documents"


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
    """F9: dedup-keep-best via row_number window (web/elastic_interaction.py:60)."""
    events = load_table(spark, sf_dir, "events")
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
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_and": _bm25_sql(BM25_AND_TERMS, "and"),
        "bm25_topk_or": _bm25_sql(BM25_OR_TERMS, "or"),
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
    }
