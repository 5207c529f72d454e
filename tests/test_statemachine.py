"""Per-stage timeout / Catch→Fail orchestration (StateMachine.txt
parity): sequential stages, context passing, fail-state recording,
skip-after-failure, and real Spark job-group cancellation on timeout."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
    Stage,
    StateMachineFailed,
    run_state_machine,
)


def test_two_stage_success_passes_context(spark):
    def validate(ctx):
        return spark.range(10).filter(F.col("id") % 2 == 0).count()

    def transform(ctx):
        return ctx["Run Task 1 - Validation"] * 100

    results = run_state_machine(
        spark,
        [
            Stage("Run Task 1 - Validation", validate),
            Stage("Run Task 2 - Transformation", transform),
        ],
    )
    assert [r.status for r in results.values()] == ["succeeded", "succeeded"]
    assert results["Run Task 2 - Transformation"].value == 500


def test_failure_trips_catch_and_skips_rest(spark):
    def boom(ctx):
        raise ValueError("bad input")

    ran = []

    def never(ctx):
        ran.append(True)

    with pytest.raises(StateMachineFailed) as exc:
        run_state_machine(
            spark,
            [Stage("Run Task 1 - Validation", boom), Stage("Task 2", never)],
        )
    assert exc.value.result.fail_state == "Run Task 1 - Validation Failed"
    assert "bad input" in exc.value.result.error
    assert not ran

    results = run_state_machine(
        spark,
        [Stage("Run Task 1 - Validation", boom), Stage("Task 2", never)],
        raise_on_failure=False,
    )
    assert results["Run Task 1 - Validation"].status == "failed"
    assert results["Task 2"].status == "skipped"


def test_timeout_cancels_spark_job_group(spark):
    """TimeoutSeconds parity: a stage stuck in a huge Spark job is
    cancelled via its job group; the session survives and later
    stages are skipped, not hung."""

    def stuck(ctx):
        # ~4 trillion rows summed — minutes of codegen work even on a
        # warm 32-core JVM, far longer than the 1.5s timeout. Sum a
        # bounded expression (raw sum(id) overflows long under ANSI).
        return spark.range(2**42).agg(F.sum(F.col("id") % 7)).collect()

    results = run_state_machine(
        spark,
        [
            Stage("Run Task 1 - Validation", stuck, timeout_s=1.5),
            Stage("Run Task 2 - Transformation", lambda ctx: 1),
        ],
        raise_on_failure=False,
    )
    r1 = results["Run Task 1 - Validation"]
    assert r1.status == "timed_out"
    assert r1.fail_state == "Run Task 1 - Validation Failed"
    assert 1.0 < r1.seconds < 30.0
    assert results["Run Task 2 - Transformation"].status == "skipped"
    # the cancelled job group must not poison the SparkContext
    assert spark.range(5).count() == 5
