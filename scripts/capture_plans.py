"""Capture ``.explain("formatted")`` output for registry queries.

Usage: ``python scripts/capture_plans.py <sf_dir> <suffix> <query ...>``

Writes ``plans/<round>/<query>_<suffix>.txt`` (round from
$SPARK_GRAFT_PLANS_ROUND, default r17) for each named query — the
before/after plan evidence the optimization rounds commit (guide §1:
capture the plan shape for every query you touch). Run from any
checkout: imports resolve against the script's own repo root, so a
pristine worktree captures the *before* plans and the optimized tree
the *after* plans.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    import __spark_entry__ as e
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
        formatted_plan,
    )

    spark = get_spark("capture-plans")
    qs = e.queries()
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17")
    out_dir = os.path.join(ROOT, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
