"""Schema-pinned parquet loaders (SURVEY.md §2 R1 — file scan source).

Reference behavior being reproduced: the client opens a file in binary mode
and learns its size before streaming it (`/root/reference/transf_client.cpp:102,109-110`).
The Spark-native equivalent of "open + size + sequential read" is a parquet
scan with an explicit schema — size/metadata come from the footer, reads are
columnar and pushed-down.

Scale notes (100 TB): loaders never infer, never cache implicitly, and return
plain scans so Catalyst can prune columns/partitions per query. Nothing here
forces materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from transf_spark import schemas
from transf_spark.session import ensure_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with its pinned schema.

    ``events`` is normalized: parquet TIMESTAMP(NANOS) → int64 nanos (via
    ``spark.sql.legacy.parquet.nanosAsLong``) → microsecond-truncated
    TIMESTAMP_NTZ, bit-identical to DuckDB's read of the same file.  The raw
    nano count is kept as ``ts_ns`` for ordering fidelity.
    """
    ensure_conf(spark)
    if name not in schemas.SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {schemas.TABLE_NAMES}")
    df = spark.read.schema(schemas.SCHEMAS[name]).parquet(table_path(sf_dir, name))
    if name == "events":
        df = (
            df.withColumn("ts_ns", F.col("ts"))
            # integer div: truncation toward -inf matches DuckDB's ns→us cast
            # for post-epoch data (all fixture timestamps are 2024+).
            .withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
            .select("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-facing API)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
