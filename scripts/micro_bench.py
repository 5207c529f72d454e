"""Min-of-N single-process noop micro-bench for a few registry
entries — the sharper instrument the r16/r17 optimization rounds use
for decisive per-entry claims (full bench.py totals fluctuate ±20% on
a shared box; a min-of-6 in one warm JVM is stable to ~0.05 s).

Usage: python scripts/micro_bench.py <sf_dir> <iters> <query ...>
Prints one ``name min median all`` line per query. Same timed region
as bench.py (noop sink, full computation), warm JVM, no records
written — a measurement tool, never the driver contract.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1]
    iters = int(sys.argv[2])
    names = sys.argv[3:]
    import __spark_entry__ as e
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import (
        get_spark,
    )

    spark = get_spark("micro-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"micro:{name}")
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(samples):.3f} "
            f"median={statistics.median(samples):.3f} "
            f"all={[round(s, 3) for s in samples]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
