"""Keyed HTTP fan-out source (SURVEY.md §2.1 [REF] rows).

The reference fetches N endpoints concurrently with asyncio.gather over a
key list (ZWEMWATER_IDS, src/rotterdam_swimming_advice.py:49,98-115,
144-155). The Spark-native shape: a DataFrame of keys/urls →
``mapInPandas`` performing the I/O per partition — partition parallelism
replaces the event loop, and the operator scales to millions of keys by
repartitioning the key table.

Fetchers are injectable:
- ``file_fetcher(mapping)``: offline replay from local fixture files (the
  test/default path — no network in this runtime).
- ``httpx_fetcher(...)``: live GET with the reference's per-request
  timeout semantics (10 s, raise-for-status, JSON-decode fallback to raw
  text, :118-141). Import-gated on httpx.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FETCH_SCHEMA = "key string, url string, status long, body string, error string"

# Reference key list (:49) and URL pattern (:46) — offline fixtures are
# keyed the same way so the fan-out shape is identical.
ZWEMWATER_IDS = ("22003", "23762", "22005", "22001")
BASE_SAFETY_URL = "https://www.zwemwater.nl/...spotid="


def file_fetcher(mapping: dict[str, str]) -> Callable[[str, str], tuple[int, str, str | None]]:
    """Offline fetcher: key → local file path. Mirrors the live fetcher's
    contract: (status, body, error)."""

    def fetch(key: str, url: str) -> tuple[int, str, str | None]:
        path = mapping.get(key)
        if path is None:
            return (404, "", f"no fixture for key {key!r}")
        try:
            with open(path, encoding="utf-8") as f:
                return (200, f.read(), None)
        except OSError as exc:
            return (500, "", str(exc))

    return fetch


def httpx_fetcher(
    headers: dict[str, str] | None = None, timeout: float = 10.0
) -> Callable[[str, str], tuple[int, str, str | None]]:
    """Live fetcher with the reference's timeout/raise semantics (:136-137).
    JSON payloads are passed through as text; downstream parses with
    from_json (the columnar analog of the decode-fallback at :138-141)."""
    import httpx

    def fetch(key: str, url: str) -> tuple[int, str, str | None]:
        try:
            with httpx.Client(timeout=timeout) as client:
                resp = client.get(url, headers=headers or {})
                resp.raise_for_status()
                return (resp.status_code, resp.text, None)
        except Exception as exc:  # per-record error capture, not job failure
            return (0, "", str(exc))

    return fetch


def fanout_fetch(
    spark: SparkSession,
    keys: list[str],
    url_for_key: Callable[[str], str],
    fetcher: Callable[[str, str], tuple[int, str, str | None]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Fan-out fetch: one row per key, I/O distributed across partitions.

    ``repartition`` spreads keys so slow endpoints don't serialize behind
    each other — with K keys and P partitions each task performs ~K/P
    sequential requests; scale P to the wanted concurrency.
    """
    rows = [(k, url_for_key(k)) for k in keys]
    df = spark.createDataFrame(rows, "key string, url string")
    if num_partitions:
        df = df.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for key, url in zip(pdf["key"], pdf["url"]):
                status, body, error = fetcher(key, url)
                out.append((key, url, status, body, error))
            yield pd.DataFrame(
                out, columns=["key", "url", "status", "body", "error"]
            )

    return df.mapInPandas(run, schema=FETCH_SCHEMA)


def parse_json_body(df: DataFrame, schema: str, body_col: str = "body") -> DataFrame:
    """Columnar JSON decode with fallback (reference :138-141): from_json
    yields NULL on undecodable payloads; the raw text is preserved."""
    return df.withColumn("parsed", F.from_json(F.col(body_col), schema))
