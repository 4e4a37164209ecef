"""File sources/sinks beyond parquet (SURVEY.md §2.1).

- S1 seed-file scan: JSON domain lists ({"links": [...]}, the reference's
  files/ua_domains_*.json read at task-manager/script_to_add_links.py:49-50)
- S2 line-file scan: newline-delimited links (crawler/main.go:51-64)
- S7 JSON debug sink (crawler/main.go:22-49)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED_SCHEMA = T.StructType([T.StructField("links", T.ArrayType(T.StringType()), False)])


def read_seed_json(spark: SparkSession, path: str) -> DataFrame:
    """{"links": [...]} → one row per link (S1)."""
    return (
        spark.read.schema(SEED_SCHEMA)
        .option("multiLine", True)
        .json(path)
        .select(F.explode("links").alias("link"))
    )


def read_links_text(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited links, blanks dropped (S2)."""
    return spark.read.text(path).select(F.trim("value").alias("link")).filter(F.length("link") > 0)


def write_json_debug(df: DataFrame, path: str) -> None:
    """S7: JSON dump sink (debug only — parquet is the real store)."""
    df.write.mode("overwrite").json(path)
