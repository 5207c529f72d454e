"""Golden-corpus parity test: run the full pipeline on the reference's
shipped Data/ CSVs and check cardinalities + spot cells against the
DynamoDB screenshots (SURVEY.md §5: 215 CategoryKPI rows, 31 OrderKPI
rows; values verified cell-for-cell during the survey).

The reference rounds with pandas (banker's) while the engine rounds
half-up (functions/core.py); the spot-checked cells are all off
rounding boundaries so both schemes agree on them. Tolerance 1e-9 on
money, 0.01 on the ×100 rates (pandas round(4)·100 vs ours).
"""

from __future__ import annotations

import os

import pytest

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    kpi,
    validate,
)
from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.readers import (
    load_ecommerce_csv,
)

REF_DATA = "/root/reference/Data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def kpis(spark):
    raw = load_ecommerce_csv(spark, REF_DATA)
    valid = validate.run_validation(raw["products"], raw["orders"], raw["order_items"])
    out = kpi.run_transformation(
        valid["products"], valid["orders"], valid["order_items"]
    )
    cat = {(r["category"], str(r["order_date"])): r for r in out["category_kpi"].collect()}
    ord_ = {str(r["order_date"]): r for r in out["order_kpi"].collect()}
    return cat, ord_


def test_cardinalities(kpis):
    cat, ord_ = kpis
    assert len(cat) == 215  # 7 categories × 31 dates
    assert len(ord_) == 31


def test_order_kpi_golden_row(kpis):
    _, ord_ = kpis
    row = ord_["2025-03-08"]
    assert row["total_orders"] == 286
    assert row["total_revenue"] == pytest.approx(69188.47, abs=1e-6)
    assert row["total_items_sold"] == 870
    assert row["return_rate"] == pytest.approx(24.71, abs=0.01)
    assert row["unique_customers"] == 281


def test_category_kpi_golden_row(kpis):
    cat, _ = kpis
    row = cat[("Electronics", "2025-03-08")]
    assert row["daily_revenue"] == pytest.approx(9831.6, abs=1e-6)
    assert row["avg_order_value"] == pytest.approx(91.03, abs=0.01)
    assert row["avg_return_rate"] == pytest.approx(24.07, abs=0.01)
