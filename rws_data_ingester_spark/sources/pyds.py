"""Custom connector through the Spark 4 Python DataSource API.

`sources/http.py` ships the keyed fan-out fetch as a mapInPandas operator;
this module ships the same contract as a *first-class connector*:
``spark.read.format("keyed_replay")`` with options, a schema, and an
``InputPartition`` split, implemented against the public
``pyspark.sql.datasource`` API (SURVEY.md §2.1 — the reference's
ZWEMWATER_IDS fan-out, src/rotterdam_swimming_advice.py:49,98-115, as a
source a user can mount anywhere Spark reads). Offline-deterministic:
payloads replay from fixture files keyed ``zwemwater_{id}.html``; a live
fetcher would swap the file read for an HTTP GET inside ``read()`` with
no change to the connector contract.

Scale shape: ``partitions()`` splits the key list, so a million-key fetch
fans out across executors with no driver involvement; each partition's
``read()`` is an independent generator (no shared state, retry-safe)."""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from rws_data_ingester_spark.plans.registry import query
from rws_data_ingester_spark.sources.http import BASE_SAFETY_URL, ZWEMWATER_IDS

_DEFAULT_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)

REPLAY_SCHEMA = "key string, url string, status bigint, body_sha string, n_bytes bigint"


class _KeyChunk(InputPartition):
    def __init__(self, keys: Sequence[str]):
        self.keys = tuple(keys)


class KeyedReplayDataSource(DataSource):
    """``format("keyed_replay")``. Options: ``keys`` (comma list, default
    the reference's ZWEMWATER_IDS), ``fixture_dir``, ``numPartitions``."""

    @classmethod
    def name(cls) -> str:
        return "keyed_replay"

    def schema(self) -> str:
        return REPLAY_SCHEMA

    def reader(self, schema) -> "KeyedReplayReader":
        return KeyedReplayReader(self.options)


class KeyedReplayReader(DataSourceReader):
    def __init__(self, options: dict):
        self.keys = [
            k for k in options.get("keys", ",".join(ZWEMWATER_IDS)).split(",") if k
        ]
        self.fixture_dir = options.get("fixture_dir", _DEFAULT_FIXTURE_DIR)
        self.n_partitions = max(1, int(options.get("numpartitions", "2")))

    def partitions(self) -> list[_KeyChunk]:
        n = min(self.n_partitions, len(self.keys)) or 1
        return [_KeyChunk(self.keys[i::n]) for i in range(n)]

    def read(self, partition: _KeyChunk) -> Iterator[tuple]:
        for key in partition.keys:
            path = os.path.join(self.fixture_dir, f"zwemwater_{key}.html")
            url = f"{BASE_SAFETY_URL}{key}"
            try:
                with open(path, "rb") as f:
                    body = f.read()
                yield (key, url, 200, hashlib.sha256(body).hexdigest(), len(body))
            except OSError:
                yield (key, url, 404, hashlib.sha256(b"").hexdigest(), 0)


@query("source_python_datasource", oracle=None)  # fixture-file payloads → rows-only
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the reference's four-spot fan-out through the registered
    custom connector and return one deterministic audit row per key
    (payload digest + size), sorted for stable output. The connector is
    re-registered per call — registration is session-level and
    idempotent."""
    spark.dataSource.register(KeyedReplayDataSource)
    df = (
        spark.read.format("keyed_replay")
        .option("numPartitions", "2")
        .load()
    )
    return df.orderBy("key").select(
        "key", "status", "body_sha", "n_bytes", F.length("url").cast("long").alias("url_len")
    )
