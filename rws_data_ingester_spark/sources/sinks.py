"""Sinks (SURVEY.md §2.1): partitioned columnar writes + the
reference-shaped single-file HTML report sink.

The report sink is the analog of ``export_to_html``
(src/rotterdam_swimming_advice.py:248-296): wrap an HTML fragment in a
page shell with a "Last updated" stamp and overwrite one file. Spark
writes directories, so the single-file path collects the (by construction
single) report row on the driver — acceptable per SURVEY §4.3(3). The
clock is injectable for deterministic tests.
"""

from __future__ import annotations

from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame

PAGE_SHELL = """<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="UTF-8">
  <title>Rotterdam Swimming Advice</title>
</head>
<body>
  <div class="container">
    <h1>Rotterdam Swimming Advice</h1>
    <div>{report}</div>
    <div class="timestamp">Last updated: {now}</div>
  </div>
</body>
</html>"""


def render_report_page(fragment: str, now: datetime | None = None) -> str:
    """Page wrap + newline→<br> + timestamp, per the reference
    (:255,:285,:289). ``now`` is injectable (SURVEY §7: inject clock)."""
    stamp = (now or datetime.now(timezone.utc)).strftime("%Y-%m-%d %H:%M")
    return PAGE_SHELL.format(report=fragment.replace("\n", "<br>"), now=stamp)


def write_report_html(
    df: DataFrame, out_path: str, fragment_col: str = "completion", now: datetime | None = None
) -> str:
    """Single-file overwrite sink (idempotent re-run, :295). The report
    pipeline produces exactly one row; assert rather than silently collect
    a large DataFrame onto the driver."""
    rows = df.select(fragment_col).limit(2).collect()
    if len(rows) != 1:
        raise ValueError(f"report sink expects exactly 1 row, got {len(rows)}")
    html = render_report_page(rows[0][0], now=now)
    Path(out_path).write_text(html, encoding="utf-8")
    return html


def write_partitioned_parquet(
    df: DataFrame, out_path: str, partition_cols: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Standard partitioned columnar sink — partitionBy gives downstream
    readers partition pruning on the listed columns."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)


def write_csv(df: DataFrame, out_path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(out_path)


def write_jsonl(df: DataFrame, out_path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(out_path)
