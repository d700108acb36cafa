"""utils/records.py: the committed perf-record log writer."""

import json

from trajectory_optimization_matrix_lie_groups_tpu.utils.records import record


def test_record_appends_jsonl(tmp_path, monkeypatch):
    p = tmp_path / "sub" / "records.jsonl"
    monkeypatch.setenv("TRAOPT_RECORDS_PATH", str(p))
    out = record("unit_test", {"value": 1.5, "unit": "solves/s"})
    assert out == str(p)
    record("unit_test_2", {"nested": {"a": [1, 2]}})
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert [l["name"] for l in lines] == ["unit_test", "unit_test_2"]
    e = lines[0]
    assert e["value"] == 1.5
    assert "when" in e and "invocation" in e
    assert lines[1]["nested"] == {"a": [1, 2]}


def test_record_never_raises(tmp_path, monkeypatch):
    """A record failure must not kill the measurement that produced it."""
    blocked = tmp_path / "f"
    blocked.write_text("x")  # a FILE where a directory is needed
    monkeypatch.setenv("TRAOPT_RECORDS_PATH", str(blocked / "r.jsonl"))
    record("unit_test", {"v": 1})  # must not raise
