"""Time arbitrary registry entries by name — the one-off measurement
tool for entries outside bench.py's HEADLINE set (streamed tiers,
lifecycle queries): each callable runs end-to-end through the noop
sink, cold then warm, exactly the bench.py discipline.

Usage: python scripts/bench_entries.py sf_dir name [name ...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as e
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )

    spark = get_spark("bench-entries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    out = {"metric": "bench_entries", "sf_dir": sf_dir, "queries": {}}
    for n in names:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out["queries"][n] = {"cold": runs[0], "warm": min(runs[1:])}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
