"""Batch sources: schema-checked parquet + multi-file CSV scans.

Reference parity (SURVEY.md §2.1):

* S1 single-CSV scan (``/root/reference/Task_1/task_1.py:76-86``) and
  S2 multi-file scan + concat (``task_1.py:88-104``) collapse into one
  ``spark.read.csv`` over a file or directory — Spark's multi-file scan
  *is* the union, executed in parallel and with the CSV parse pushed to
  executors instead of a driver-side ``pd.concat``.
* S3 file-presence gate (``task_1.py:34-61``; ``lambda_trigger.py:44-65``)
  becomes :func:`require_inputs` — a cheap driver-side existence probe
  before any job is submitted.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import ECOMMERCE_SCHEMAS, TESTDATA_SCHEMAS


def read_csv_table(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """Read a CSV file or directory of CSVs with an explicit schema.

    ``timestampFormat`` accepts the reference's ISO ``yyyy-MM-dd'T'HH:mm:ss``
    strings; a directory path gives the implicit union of operator S2.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def load_ecommerce_csv(spark: SparkSession, base_dir: str) -> dict[str, DataFrame]:
    """Load the reference-shaped raw zone: ``products.csv``, ``orders/``,
    ``order_items/`` under ``base_dir``."""
    layout = {
        "products": os.path.join(base_dir, "products.csv"),
        "orders": os.path.join(base_dir, "orders"),
        "order_items": os.path.join(base_dir, "order_items"),
    }
    return {
        name: read_csv_table(spark, path, ECOMMERCE_SCHEMAS[name])
        for name, path in layout.items()
    }


def require_inputs(base_dir: str) -> None:
    """Pre-flight readiness gate: raise ``FileNotFoundError`` unless all
    three raw inputs exist (reference operator S3)."""
    required = ["products.csv", "orders", "order_items"]
    missing = [p for p in required if not os.path.exists(os.path.join(base_dir, p))]
    if missing:
        raise FileNotFoundError(f"missing required inputs under {base_dir}: {missing}")


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's parquet testdata tables from ``sf_dir``.

    Parquet footers carry the schema; we pass none so the scan keeps
    predicate pushdown + column pruning, and tests assert the footer
    matches :data:`TESTDATA_SCHEMAS`.
    """
    names = tables or tuple(TESTDATA_SCHEMAS)
    return {
        name: _read_testdata_table(spark, sf_dir, name) for name in names
    }


def _read_testdata_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; ``events.ts`` has varied across testdata
    generations — TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects; read nanos as long and floor-convert, the same truncation
    DuckDB applies) or zone-less ``timestamp[us]`` (surfaces as
    TIMESTAMP_NTZ; cast to session-zone TIMESTAMP). Either way callers
    see one stable type: microsecond TimestampType."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # timestamp[us] without a zone surfaces as TIMESTAMP_NTZ; the
        # engine contract is session-zone TIMESTAMP (sessions run UTC,
        # so the cast is wall-clock identity — same values DuckDB sees)
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_jsonl_table(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema — the third
    source format next to CSV and parquet. Schema-first for the same
    reason as CSV (no inference pass over 100 TB, stable types);
    corrupt lines land in nulls under PERMISSIVE mode unless callers
    pass ``mode="FAILFAST"``."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)
