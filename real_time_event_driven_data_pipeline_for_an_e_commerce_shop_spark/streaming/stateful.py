"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in windowed/session aggregations (``windows.py``) cover the
reference's KPI semantics; this module is the escape hatch for state
machines Spark has no native operator for — running per-key
accumulators, custom timeout logic, cross-batch sequence detection.

State layout notes (the part that matters at 100 TB/day):

* state is partitioned by the group key (one shuffle per micro-batch,
  same key → same executor), held in the state store (RocksDB in prod
  config), checkpointed incrementally;
* the Arrow batch boundary means one Python roundtrip per key-group
  per batch — keep per-group state tiny (here: two longs) and never
  buffer raw events in state;
* money is accumulated in integer cents so the running total is exact
  and independent of batch arrival order (a float accumulator would
  drift by arrival history, breaking the batch-equivalence test).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n_events long, total_cents long"


def _update_running_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # det_round-equivalent half-up at 2 dp, in integer space:
        # floor(x*100 + 0.5), NOT int() — int() truncates toward zero,
        # which diverges from det_round for negatives (ADVICE r1 #2).
        # Nulls are skipped, matching SUM-over-nullable semantics.
        v = pdf["value"].dropna().to_numpy(dtype="float64")
        cents += int(np.floor(v * 100.0 + 0.5).sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user lifetime event count + exact running value total,
    updated every micro-batch (update output mode). The stateful twin
    of ``SELECT user_id, count(*), sum(round(value,2)) GROUP BY
    user_id`` — but incremental: each batch touches only the users
    present in it."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
