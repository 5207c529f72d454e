"""Event-driven pipeline — the reference's Lambda + Step Functions +
sentinel-file orchestration (SURVEY.md §2.7), as Structured Streaming.

Mapping, piece by piece:

* S3 PutObject → Lambda trigger (``lambda_trigger.py:8-28``) → file
  source: ``spark.readStream...csv(raw_dir)`` discovers newly arrived
  files per micro-batch.
* run-once sentinel (``lambda_trigger.py:31-42,68``, operator S4) →
  the **checkpoint**: offsets + sink commit log give exactly-once
  processing of each arrived file, across restarts, with zero custom
  code.
* readiness gate (``:44-65``, S3-op) → :func:`sources.readers.
  require_inputs` pre-flight.
* Task1 → Task2 sequencing (``StateMachine.txt``) → one lazy DataFrame
  composition: validation and KPI stages fuse into a single plan per
  micro-batch (Catalyst sees through both).
* archive-after-process (``Task_2/task_2.py:237-263``, S8) →
  ``cleanSource=archive`` on the file source.
* ``trigger(availableNow=True)`` reproduces the reference's
  run-per-upload-batch cadence; swap for ``processingTime`` for a
  continuously running deployment.

Incrementality upgrade over the reference: instead of recomputing the
full snapshot per trigger, each micro-batch recomputes **only the date
partitions touched by newly arrived items** and upserts them via
dynamic partition overwrite (``sinks.kv``). At 100 TB a day's arrival
touches a handful of partitions; the reference's full recompute would
touch all of them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import kpi, validate
from ..schemas import ORDER_ITEMS_SCHEMA
from ..sinks.kv import KeyedParquetUpsertSink
from ..sources.readers import load_ecommerce_csv


def run_event_driven_pipeline(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    await_termination: bool = True,
):
    """Start the file-triggered KPI pipeline over a reference-shaped raw
    zone (``products.csv``, ``orders/``, ``order_items/``).

    The order_items stream drives processing (it is the fact at item
    grain); products/orders are re-read as batch dimensions per
    micro-batch — the reference does the same full re-read of all
    three inputs per trigger (``task_2.py:271-273``).
    """
    cat_sink = KeyedParquetUpsertSink(
        os.path.join(out_dir, "category_kpi"), "order_date"
    )
    ord_sink = KeyedParquetUpsertSink(os.path.join(out_dir, "order_kpi"), "order_date")

    reader = (
        spark.readStream.schema(ORDER_ITEMS_SCHEMA)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .option("maxFilesPerTrigger", 64)
    )
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    items_stream = reader.csv(os.path.join(raw_dir, "order_items"))

    def process_batch(new_items: DataFrame, epoch_id: int) -> None:
        if new_items.isEmpty():
            return
        raw = load_ecommerce_csv(spark, raw_dir)
        valid = validate.run_validation(
            raw["products"], raw["orders"], raw["order_items"]
        )
        orders_ctx = kpi.with_return_flag(valid["orders"])
        # dates whose KPIs are affected by this batch of item files
        touched = (
            validate.validate_order_items(new_items, valid["orders"])
            .join(orders_ctx.select("order_id", "order_date"), "order_id")
            .select("order_date")
            .distinct()
        )
        fact = kpi.build_item_fact(
            valid["order_items"], orders_ctx, valid["products"]
        ).join(F.broadcast(touched), "order_date", "left_semi")
        cat_sink.upsert(kpi.category_kpi(fact))
        ord_sink.upsert(kpi.order_kpi(fact))

    q = (
        items_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
