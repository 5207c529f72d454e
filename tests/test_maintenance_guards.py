"""The two ADVICE-r11 hygiene fixes, test-gated: query-local scratch
dirs are registered for interpreter-exit cleanup (not leaked
forever), and one corrupt bench record cannot disable the variance
guard's trailing baseline."""

from __future__ import annotations

import json
import os


def test_scratch_zone_registers_atexit_cleanup(monkeypatch):
    """_scratch_zone must hand every dir it creates to atexit with an
    ignore-errors rmtree — the *_stream entries cannot clean up in
    their own finally blocks (the returned DataFrame's files must
    outlive the call), so process exit is the cleanup boundary."""
    import atexit
    import shutil

    registered = []
    monkeypatch.setattr(
        atexit, "register", lambda fn, *a, **kw: registered.append(
            (fn, a, kw)
        )
    )
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.queries import (
        _scratch_zone,
    )

    d = _scratch_zone("t_atexit")
    try:
        assert os.path.isdir(d)
        assert len(registered) == 1
        fn, args, kwargs = registered[0]
        assert fn is shutil.rmtree and args == (d,)
        assert kwargs.get("ignore_errors") is True
        # the registered call actually removes the dir
        fn(*args, **kwargs)
        assert not os.path.exists(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bench_trailing_record_skips_corrupt_files(tmp_path):
    """A corrupt newest BENCH_LOCAL record must be SKIPPED (falling
    through to the next-newest same-sf record), not abort the scan
    and silently disable the variance guard."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py",
        ),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    good = {"sf": 0.1, "queries": {"q1": 1.5}}
    (tmp_path / "BENCH_LOCAL_r01.json").write_text(json.dumps(good))
    (tmp_path / "BENCH_LOCAL_r02.json").write_text("{not json")
    assert bench._trailing_queries(str(tmp_path), 0.1) == {"q1": 1.5}

    # a newer record at a DIFFERENT sf is also passed over
    (tmp_path / "BENCH_LOCAL_r03.json").write_text(
        json.dumps({"sf": 0.001, "queries": {"q1": 0.01}})
    )
    assert bench._trailing_queries(str(tmp_path), 0.1) == {"q1": 1.5}

    # nothing readable at the requested sf -> empty, never a raise
    assert bench._trailing_queries(str(tmp_path), 0.5) == {}
    assert bench._trailing_queries(str(tmp_path / "missing"), 0.1) == {}


def test_parse_describe_location_handles_malformed_rows():
    """VERDICT r12 #5: the DESCRIBE FORMATTED parse must not raise on
    (or silently mis-read) malformed rows — rows without the expected
    fields are skipped, a non-string Location value resolves to None
    (path-based fallback), and a well-formed row still parses, with
    the file: scheme stripped."""
    from types import SimpleNamespace as Row

    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        _parse_describe_location,
    )

    # well-formed: the normal DESCRIBE FORMATTED shape
    rows = [
        Row(col_name="col1", data_type="bigint"),
        Row(col_name="Location", data_type="file:/tmp/zone/t"),
    ]
    assert _parse_describe_location(rows) == "/tmp/zone/t"

    # no Location row at all
    assert _parse_describe_location(
        [Row(col_name="col1", data_type="bigint")]
    ) is None

    # malformed rows BEFORE the Location row are skipped, not fatal
    rows = [
        object(),  # no col_name/data_type fields at all
        Row(col_name=None, data_type=None),  # null header row
        Row(col_name="Location", data_type="/no/scheme/prefix"),
    ]
    assert _parse_describe_location(rows) == "/no/scheme/prefix"

    # a Location row whose value is not a string degrades to None
    # (callers fall back to the path argument) instead of raising
    assert _parse_describe_location(
        [Row(col_name="Location", data_type=None)]
    ) is None

    assert _parse_describe_location([]) is None


def test_on_disk_epochs_ignores_non_integer_epoch_dirs(tmp_path):
    """A directory that merely looks like an epoch partition never
    poisons the scrub set."""
    from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.pipeline import (
        _on_disk_epochs,
    )

    for d in ("_epoch=3", "_epoch=17", "_epoch=abc", "_epoch=", "other"):
        (tmp_path / d).mkdir()
    assert _on_disk_epochs(str(tmp_path)) == {3, 17}
