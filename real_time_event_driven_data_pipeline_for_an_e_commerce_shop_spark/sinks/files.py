"""Zone sinks — the reference's S5/S6 CSV writers, Spark-first.

* S5 validated zone (``/root/reference/Task_1/task_1.py:148-158``):
  the reference serializes whole DataFrames to CSV strings on the
  driver and PUTs them to S3; here it is a distributed parquet write
  (columnar, splittable, statistics for downstream pushdown — CSV kept
  as an option for drop-in compatibility).
* S6 processed zone (``Task_2/task_2.py:200-235``): run-timestamped
  output directory; the timestamp comes from the caller (driver),
  never from data — same as the reference.

At 100 TB the validated zone is partitioned by ``order_date`` so the
KPI stage and any date-ranged query prune partitions statically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_validated_zone(
    tables: dict[str, DataFrame],
    base_dir: str,
    fmt: str = "parquet",
    partition_facts_by: str | None = "order_date",
) -> None:
    """Write validated tables; fact tables partitioned by date when the
    column exists (dimension tables are written flat)."""
    for name, df in tables.items():
        writer = df.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            writer = writer.option("header", True)
        if partition_facts_by and partition_facts_by in df.columns:
            writer = writer.partitionBy(partition_facts_by)
        writer.save(f"{base_dir}/{name}")


def write_processed_zone(
    kpis: dict[str, DataFrame], base_dir: str, run_ts: str, fmt: str = "csv"
) -> None:
    """Run-timestamped KPI outputs (S6): ``{base}/{run_ts}/{name}``."""
    for name, df in kpis.items():
        writer = df.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            writer = writer.option("header", True)
        writer.save(f"{base_dir}/{run_ts}/{name}")
