"""Iceberg source gating (BASELINE.json input_hint names an Iceberg corpus
table; the sandbox image ships no Iceberg jars).

`read_corpus_table` prefers a catalog table when the Iceberg runtime is on the
classpath (production: spark-submit --packages org.apache.iceberg:...
--conf spark.sql.catalog.<cat>=org.apache.iceberg.spark.SparkCatalog), and
falls back to a parquet directory of the same schema otherwise — the scan,
pushdown, and pruning behavior downstream is identical either way.

Maintenance ops the admin console maps to (SURVEY.md §3.3): with Iceberg these
are `DELETE FROM`, `DROP TABLE`, schema evolution via `ALTER TABLE` —
replacing the reference's close-index → PutMapping → open dance
(elastic-interaction/elastic_settings.go:35-92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_corpus_table(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Iceberg table name (catalog.db.table) when available, else parquet path."""
    if "/" not in table_or_path and iceberg_available(spark):
        return spark.read.table(table_or_path)
    return spark.read.parquet(table_or_path)
