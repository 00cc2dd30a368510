"""Batch readers & writers beyond the parquet catalog — SURVEY.md §2 B3-B4.

CSV ingest and parquet sink round-trips, with explicit schemas on every
read (inference scans are banned engine-wide; see catalog.py).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """B4 parquet sink.  Snappy parquet, one directory per dataset; at
    scale add ``partitionBy`` on the natural pruning column (e.g. event
    date) so downstream reads partition-prune."""
    df.write.mode(mode).parquet(path)
    return path


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    df.write.mode(mode).option("header", True).csv(path)
    return path


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """B3 CSV scan with explicit schema (header skipped, never inferred)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def scratch_dir(prefix: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{uuid.uuid4().hex[:8]}")
