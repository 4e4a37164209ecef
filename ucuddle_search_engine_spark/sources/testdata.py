"""Readers for the driver-generated parquet tables (TESTDATA.md) and for the
engine's own corpus parquet (schema.CORPUS_SCHEMA).

Reference analogues: seed-file scan S1 (task-manager/script_to_add_links.py:49)
and the ES document source. Everything is a plain columnar parquet scan so
Catalyst pushdown/pruning applies (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a corpus table (repo, path, commit, lang, content). With an Iceberg
    catalog on the classpath this becomes spark.read.table(name); the sandbox
    image has no Iceberg jars, so parquet stands in (same columnar scan)."""
    return spark.read.parquet(path)
