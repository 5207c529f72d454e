"""Keyed upsert sink — the reference's S7 DynamoDB writer, Spark-first.

The reference writes 246 sequential row-at-a-time ``put_item`` calls
(``/root/reference/Task_2/task_2.py:144-197``) — the slowest part of
its pipeline and unusable at scale. Here the same "upsert by key"
contract is a **dynamic partition overwrite**: KPI tables are keyed by
``order_date`` (+ category), so writing a batch replaces exactly the
date partitions it touches and leaves the rest of the table untouched.
That is the 100 TB-safe shape: no read-modify-write of the full table,
no driver-side row loop, atomic per-partition swap.

For key columns that are not partitionable (arbitrary upsert keys) the
sink falls back to a merge rewrite (read → anti-join → union → swap),
which is what MERGE INTO does under the hood without a table format.
A true KV store (DynamoDB etc.) would plug in via ``foreachPartition``
with batched writes — out of scope for this offline build, the
partition-overwrite sink is the product.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class KeyedParquetUpsertSink:
    """Upsert-by-key parquet table.

    ``partition_key`` (e.g. ``order_date``) drives dynamic partition
    overwrite — the scalable path. ``extra_keys`` participate in row
    identity for the merge fallback only.
    """

    def __init__(
        self,
        path: str,
        partition_key: str,
        extra_keys: tuple[str, ...] = (),
    ) -> None:
        self.path = path
        self.partition_key = partition_key
        self.extra_keys = extra_keys

    def upsert(self, batch: DataFrame) -> None:
        """Replace exactly the partitions present in ``batch``."""
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch.write.mode("overwrite")
                .partitionBy(self.partition_key)
                .parquet(self.path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def merge_upsert(self, batch: DataFrame) -> None:
        """Full-key merge fallback: old rows not matching any batch key
        survive, batch rows win on conflict. Rewrites the table — use
        :meth:`upsert` whenever the key is the partition column."""
        spark = batch.sparkSession
        keys = [self.partition_key, *self.extra_keys]
        if os.path.exists(self.path):
            current = spark.read.parquet(self.path)
            keep = current.join(batch.select(*keys), keys, "left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch
        tmp = tempfile.mkdtemp(prefix="kv_upsert_", dir=os.path.dirname(self.path) or ".")
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.replace(tmp, self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def _fn(batch: DataFrame, epoch_id: int) -> None:
            self.upsert(batch)

        return _fn
