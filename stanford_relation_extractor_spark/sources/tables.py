"""Parquet table loading / temp-view registration.

The sandbox test data is plain parquet (TESTDATA.md). In production
these reads are Iceberg catalog tables — `spark.read.table(...)` with
partition pruning on `conv_id` buckets and `ts` ranges; the rest of the
pipeline is storage-agnostic DataFrames either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Session -> sf_dir the views currently point at. Re-registering the
# same directory is pure overhead: every `spark.read.parquet` fires a
# driver-sequenced schema/footer job (~30ms + scheduler gap), and the
# callers (transcripts_df, alias_dict_df, ...) each re-register — one
# e2e build paid ~20 such jobs (~1.5s measured, guide §1.1). Only the
# VIEW DDL is memoized — no data or query result is cached; every scan
# still reads the parquet files.
_VIEWS_AT: dict[str, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view named after itself
    (idempotent per session until ``sf_dir`` changes)."""
    key = spark.sparkContext.applicationId
    path = os.path.abspath(sf_dir)
    if _VIEWS_AT.get(key) == path:
        return
    for name in TABLE_NAMES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_AT[key] = path
