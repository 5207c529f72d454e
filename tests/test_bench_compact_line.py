"""bench.py's driver-tail contract (VERDICT r13 #5): the final stdout
line must be valid JSON that fits the driver's ~2000-char tail window
for ANY query set — property-tested here so a future headline-list
growth can't silently push the line back over the window."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(_here, "bench.py")
)
bench_mod = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_mod", bench_mod)
_spec.loader.exec_module(bench_mod)
_compact_line = bench_mod._compact_line


def _record(queries, outliers=()):
    return {
        "metric": "headline_queries_total",
        "unit": "sec",
        "sf": 0.1,
        "value": round(sum(queries.values()), 3),
        "outliers": {k: {} for k in outliers},
        "queries": queries,
    }


names = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=40
)
qdicts = st.dictionaries(
    names,
    st.floats(min_value=0.0, max_value=5000.0, allow_nan=False),
    min_size=0,
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(qdicts)
def test_compact_line_always_fits_and_parses(queries):
    line = _compact_line(_record(queries), limit=1950)
    assert len(line) <= 1950
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total"
    assert d["unit"] == "sec" and d["sf"] == 0.1
    kept = d["queries"]
    omitted = d.get("queries_omitted", 0)
    assert len(kept) + omitted == len(queries)
    # the kept entries are the SLOWEST ones: every kept value must be
    # >= every dropped value (ties broken by name, so compare rounded)
    if omitted and kept:
        ndigits = 1  # omission only happens after the 1-dp retry
        dropped = [
            round(v, ndigits)
            for k, v in queries.items()
            if k not in kept
        ]
        assert min(kept.values()) >= max(dropped) or (
            # rounding can flip strictness by at most one ulp of the
            # rounded grid
            abs(min(kept.values()) - max(dropped)) < 10 ** -ndigits
        )


@settings(max_examples=50, deadline=None)
@given(qdicts)
def test_compact_line_tiny_limit_degrades_to_summary(queries):
    line = _compact_line(_record(queries), limit=250)
    d = json.loads(line)
    assert d["value"] == round(sum(queries.values()), 3)
    assert len(d["queries"]) + d.get("queries_omitted", 0) == len(
        queries
    )


def test_compact_line_real_record_fits():
    path = os.path.join(_here, "BENCH_LOCAL_r14.json")
    with open(path) as f:
        rec = json.load(f)
    line = _compact_line(rec)
    assert len(line) <= 1950
    d = json.loads(line)
    assert d["value"] == rec["value"]


def test_compact_line_prefer_pins_previous_driver_names():
    """VERDICT r16 #9: names on the previous driver record's parsed
    line must survive omission even when they are among the FASTEST,
    so the driver's differ stops reporting speed-ups as drops."""
    queries = {f"q{i:03d}_{'x' * 18}": 0.1 + i * 0.05 for i in range(120)}
    # prefer the 40 FASTEST names — exactly the ones the unpinned
    # order would drop first
    prefer = tuple(sorted(queries, key=lambda k: queries[k])[:40])
    line = _compact_line(_record(queries), limit=1600, prefer=prefer)
    d = json.loads(line)
    assert len(line) <= 1600
    assert d.get("queries_omitted", 0) > 0  # the limit does bite
    assert set(prefer) <= set(d["queries"])  # preferred never dropped
    # and the accounting still closes
    assert len(d["queries"]) + d["queries_omitted"] == len(queries)


def test_compact_line_prefer_degrades_when_even_prefer_overflows():
    """If the preferred set alone cannot fit, the line still parses
    and still fits — preferred names drop last, fastest-first."""
    queries = {f"q{i:03d}_{'y' * 18}": 1.0 + i for i in range(120)}
    prefer = tuple(queries)
    line = _compact_line(_record(queries), limit=400, prefer=prefer)
    d = json.loads(line)
    assert len(line) <= 400
    assert len(d["queries"]) + d.get("queries_omitted", 0) == len(queries)
    if d["queries"]:
        # the kept preferred entries are the slowest of the preferred
        kept_min = min(d["queries"].values())
        dropped = [
            round(v, 1) for k, v in queries.items() if k not in d["queries"]
        ]
        assert kept_min >= max(dropped) - 0.1


def test_prev_driver_queries_reads_newest_bench_record(tmp_path):
    for n, names in ((2, ["a", "b"]), (5, ["c", "d"])):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"parsed": {"queries": {k: 1.0 for k in names}}})
        )
    assert bench_mod._prev_driver_queries(str(tmp_path)) == ("c", "d")
    assert bench_mod._prev_driver_queries(str(tmp_path / "missing")) == ()
