"""Stage orchestration with per-stage timeout and Catch→Fail branches.

The reference sequences its two ETL programs with a Step Functions
state machine (``/root/reference/StateMachine.txt``): Task 1 →
Task 2 → Success, each Task carrying ``TimeoutSeconds: 300``
(``StateMachine.txt:31,68``) and a ``Catch: States.ALL`` branch to a
named Fail state (``StateMachine.txt:32-39,69-76,79-88``). Inside one
Spark application the Spark-first equivalent of "kill the task on
timeout" is **job-group cancellation**: each stage's work runs in a
worker thread under its own job group (job-group assignment is
thread-local in Spark), and on timeout the driver calls
``SparkContext.cancelJobGroup`` — every job the stage submitted is
cancelled cluster-wide, which is exactly what ECS task termination did
for the reference, minus the container spin-up.

Failure semantics mirror the ASL document: the first stage that raises
or times out trips its Catch branch — the machine records the named
fail state, skips every remaining stage, and (by default) re-raises so
callers keep plain exception propagation. Nothing here touches data;
it is pure driver-side control flow around DataFrame actions.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


@dataclass
class Stage:
    """One Task state: ``run(context)`` does the work (DataFrame
    actions included); ``timeout_s`` mirrors ``TimeoutSeconds``;
    ``fail_state`` names the Catch target (``"<name> Failed"`` when
    omitted, matching ``StateMachine.txt:79-88``)."""

    name: str
    run: Callable[[dict], Any]
    timeout_s: float | None = 300.0
    fail_state: str | None = None


@dataclass
class StageResult:
    name: str
    status: str  # succeeded | failed | timed_out | skipped
    seconds: float = 0.0
    error: str | None = None
    fail_state: str | None = None
    value: Any = field(default=None, repr=False)


class StateMachineFailed(RuntimeError):
    def __init__(self, result: StageResult):
        self.result = result
        super().__init__(
            f"{result.fail_state}: stage {result.name!r} {result.status}"
            + (f" ({result.error})" if result.error else "")
        )


def _clear_job_group(spark: SparkSession) -> None:
    """Reset the worker thread's job-group tag. PySpark's
    ``SparkContext`` has no ``clearJobGroup`` wrapper (the Scala one
    does); clearing the thread-local properties it sets is the
    documented equivalent."""
    sc = spark.sparkContext
    clear = getattr(sc, "clearJobGroup", None)
    if clear is not None:
        clear()
        return
    for prop in ("spark.jobGroup.id", "spark.job.description",
                 "spark.job.interruptOnCancel"):
        sc.setLocalProperty(prop, None)


def run_state_machine(
    spark: SparkSession,
    stages: list[Stage],
    context: dict | None = None,
    raise_on_failure: bool = True,
) -> dict[str, StageResult]:
    """Run stages sequentially with per-stage watchdogs.

    Each stage executes in a worker thread whose Spark jobs are tagged
    with the job group ``sm:<stage name>``; the driver waits
    ``timeout_s`` and cancels the group if the stage is still running
    (``interruptOnCancel=True`` so straggler tasks get a thread
    interrupt, not just a no-new-tasks flag). A stage's return value is
    stored at ``context[stage.name]`` for downstream stages — the
    state-machine input/output passing of the ASL document.
    """
    context = context if context is not None else {}
    results: dict[str, StageResult] = {}
    failed: StageResult | None = None
    for stage in stages:
        if failed is not None:
            results[stage.name] = StageResult(stage.name, "skipped")
            continue
        group = f"sm:{stage.name}"
        outcome: dict[str, Any] = {}

        def work(stage=stage, group=group, outcome=outcome):
            # thread-local: tags every job this stage submits
            spark.sparkContext.setJobGroup(
                group, f"state-machine stage {stage.name}", True
            )
            try:
                outcome["value"] = stage.run(context)
            except BaseException as exc:  # recorded, not swallowed
                outcome["error"] = exc
            finally:
                _clear_job_group(spark)

        t0 = time.monotonic()
        worker = threading.Thread(target=work, daemon=True, name=group)
        worker.start()
        worker.join(stage.timeout_s)
        elapsed = time.monotonic() - t0
        fail_state = stage.fail_state or f"{stage.name} Failed"
        if worker.is_alive():
            spark.sparkContext.cancelJobGroup(group)
            worker.join(30.0)  # cancellation surfaces as an exception
            failed = StageResult(
                stage.name,
                "timed_out",
                elapsed,
                f"exceeded {stage.timeout_s}s; job group {group!r} cancelled",
                fail_state,
            )
            results[stage.name] = failed
        elif "error" in outcome:
            failed = StageResult(
                stage.name, "failed", elapsed, repr(outcome["error"]), fail_state
            )
            results[stage.name] = failed
        else:
            value = outcome.get("value")
            context[stage.name] = value
            results[stage.name] = StageResult(
                stage.name, "succeeded", elapsed, value=value
            )
    if failed is not None and raise_on_failure:
        raise StateMachineFailed(failed)
    return results
