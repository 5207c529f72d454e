from .files import write_processed_zone, write_validated_zone
from .kv import KeyedParquetUpsertSink

__all__ = ["KeyedParquetUpsertSink", "write_processed_zone", "write_validated_zone"]
