"""Connector edge cases: PERMISSIVE JSONL parse (the columnar analog of
the reference's decode-with-fallback, src/rotterdam_swimming_advice.py
:138-141) must capture malformed lines in _corrupt_record, not fail."""

from __future__ import annotations

from rws_data_ingester_spark.sources.readers import read_jsonl


def test_jsonl_permissive_captures_corrupt_records(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "also ok"}\n'
    )
    df = read_jsonl(spark, str(p), schema="id long, name string").cache()
    good = df.filter("_corrupt_record IS NULL").collect()
    bad = df.filter("_corrupt_record IS NOT NULL").collect()
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "{this is not json}" in bad[0]["_corrupt_record"]
