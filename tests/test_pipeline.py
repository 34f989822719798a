"""Golden tests for prompt assembly, the LLM stub, the columnar prompt
builder, and the end-to-end offline pipeline + report sink
(reference semantics: src/rotterdam_swimming_advice.py:158-227,230-245,
248-296; stub contract: FIXTURES.md §B5).
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from rws_data_ingester_spark.functions.llm import enrich_with_llm, stub_complete
from rws_data_ingester_spark.functions.prompting import build_prompts, render_prompt
from rws_data_ingester_spark.sources.ingest_queries import run_offline_pipeline
from rws_data_ingester_spark.sources.sinks import render_report_page, write_report_html

from tests.conftest import FIXTURES


def _json(name: str) -> dict:
    return json.loads((FIXTURES / name).read_text())


def test_render_prompt_extracts_measurements():
    p = render_prompt(_json("waterinfo_detail.json"), _json("watermessages.json"), {"x": 1})
    assert "Water temperature: 22.3 °C" in p
    assert "Water level: -2.0 cm" in p
    assert "Wind speed: 9.01 m/s" in p
    assert "- Kust en Rijnmondgebied: No issues" in p
    assert "- Rivieren: Low water levels" in p


def test_render_prompt_defaults_on_missing():
    p = render_prompt(_json("waterinfo_detail_missing.json"), _json("watermessages_empty.json"), {})
    assert "Water temperature: N/A °C" in p
    assert "Water level: N/A cm" in p
    assert "Wind speed: N/A m/s" in p
    assert "- No official messages" in p


def test_columnar_prompt_matches_python_renderer(spark):
    """The distributed (Catalyst-expression) prompt builder must produce
    byte-identical prompts to the driver-side renderer."""
    wd, wm = _json("waterinfo_detail.json"), _json("watermessages.json")
    expected = render_prompt(wd, wm, "SAFETY")
    df = spark.createDataFrame(
        [(wd["latest"]["data"], wd["related"], wm["messages"], "SAFETY")],
        "level string, related array<struct<label:string,data:string>>, "
        "messages array<struct<title:string,bannerText:string>>, safety_repr string",
    )
    out = build_prompts(
        df, level_col="level", related_col="related",
        messages_col="messages", safety_col="safety_repr",
    ).select("prompt").collect()[0][0]
    assert out == expected


def test_llm_stub_contract(spark):
    df = spark.createDataFrame([("hello",), ("world",)], "prompt string")
    out = {r["prompt"]: r["completion"] for r in enrich_with_llm(df).collect()}
    for p in ("hello", "world"):
        assert out[p] == "<div>STUB:" + hashlib.sha256(p.encode()).hexdigest() + "</div>"
        assert out[p] == stub_complete(p)


def test_offline_pipeline_deterministic(spark, tmp_path):
    df1 = run_offline_pipeline(spark).collect()[0]
    df2 = run_offline_pipeline(spark).collect()[0]
    assert df1["prompt"] == df2["prompt"]
    assert df1["completion"] == df2["completion"]
    assert "Kralingse Plas" in df1["prompt"]
    assert "Zevenhuizerplas" in df1["prompt"]
    # report sink writes a single overwritten file with injected clock
    now = datetime(2026, 1, 2, 3, 4, tzinfo=timezone.utc)
    out = tmp_path / "report.html"
    html = write_report_html(run_offline_pipeline(spark), str(out), now=now)
    assert out.read_text() == html
    assert "Last updated: 2026-01-02 03:04" in html
    assert "<div>STUB:" in html


def test_render_report_page_newline_to_br():
    html = render_report_page("line1\nline2", now=datetime(2026, 1, 1, tzinfo=timezone.utc))
    assert "line1<br>line2" in html
