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


def test_python_datasource_replays_all_keys_deterministically(spark):
    from rws_data_ingester_spark.sources.pyds import KeyedReplayDataSource

    spark.dataSource.register(KeyedReplayDataSource)
    read = lambda **opts: (
        spark.read.format("keyed_replay")
        .options(**{k: str(v) for k, v in opts.items()})
        .load()
    )
    base = read(numPartitions=2).orderBy("key").collect()
    assert [r["key"] for r in base] == ["22001", "22003", "22005", "23762"]
    assert all(r["status"] == 200 and r["n_bytes"] > 0 for r in base)
    # partition split must not change the result set
    assert read(numPartitions=3).orderBy("key").collect() == base
    # second read identical (generator is stateless → retry-safe)
    assert read(numPartitions=2).orderBy("key").collect() == base


def test_python_datasource_missing_key_yields_404_row(spark):
    from rws_data_ingester_spark.sources.pyds import KeyedReplayDataSource

    spark.dataSource.register(KeyedReplayDataSource)
    rows = (
        spark.read.format("keyed_replay")
        .option("keys", "22003,99999")
        .load()
        .orderBy("key")
        .collect()
    )
    assert [(r["key"], r["status"]) for r in rows] == [("22003", 200), ("99999", 404)]
    assert rows[1]["n_bytes"] == 0


def test_schema_evolution_backfills_old_generation(spark):
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.catalog import Catalog
    from rws_data_ingester_spark.plans import REGISTRY
    from pyspark.sql import functions as F

    ev = Catalog(spark, SF_DIR).events
    # Mirror the query's generation split exactly (round-6 ADVICE): the
    # query coalesces so NULL event_ids land in the old generation, and
    # Spark's % keeps the dividend's sign so negative-odd ids yield -1,
    # not 1 — a bare `% 2 == 0` expectation diverges on fuzz warehouses.
    n_old = ev.filter(
        F.coalesce(F.col("event_id") % 2, F.lit(0)) == 0
    ).count()
    n_total = ev.count()
    row = REGISTRY["source_schema_evolution"].fn(spark, SF_DIR).collect()[0]
    assert row["n_rows"] == n_total
    assert row["n_backfilled_nulls"] == n_old
    assert row["n_scored"] == n_total - n_old
    assert row["n_generations"] == 2


def test_corrupt_json_quarantined_not_dropped(spark):
    from tests.conftest import SF_DIR
    from rws_data_ingester_spark.plans import REGISTRY

    row = REGISTRY["source_json_corrupt_records"].fn(spark, SF_DIR).collect()[0]
    assert row["n_corrupt"] == 5
    assert row["n_good"] == row["n_lines"] - 5
    assert row["n_good"] > 0
