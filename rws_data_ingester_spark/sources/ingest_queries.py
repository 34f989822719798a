"""The reference-shaped end-to-end pipeline, offline (SURVEY.md §7 step 6).

Reproduces the full fetch→extract→prompt→enrich→report flow of the
reference's ``main()`` (src/rotterdam_swimming_advice.py:299-312) as a
Spark pipeline running entirely from stored fixtures:

  keyed fan-out fetch (mapInPandas over the spot-id table, :98-115)
    → HTML-extract pandas UDF (:52-95)
    → aggregate spot records (collect per-run, :111-115)
    → prompt assembly (:158-227)
    → deterministic LLM stub via mapInPandas (:230-245; FIXTURES.md §B5)
    → one report row (the sink wraps it to HTML, sinks.write_report_html)

Registered as rows-only queries (network/HTML/LLM ops are outside the
SQL oracle — SURVEY §2.1/§2.10); golden-output unit tests pin the values.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rws_data_ingester_spark.functions.html_extract import extract_spots
from rws_data_ingester_spark.functions.llm import enrich_with_llm
from rws_data_ingester_spark.functions.prompting import render_prompt
from rws_data_ingester_spark.plans.registry import query
from rws_data_ingester_spark.sources.http import ZWEMWATER_IDS, fanout_fetch, file_fetcher

FIXTURES_DIR = Path(__file__).resolve().parents[2] / "tests" / "fixtures"


def spot_fixture_mapping() -> dict[str, str]:
    return {sid: str(FIXTURES_DIR / f"zwemwater_{sid}.html") for sid in ZWEMWATER_IDS}


def fetch_and_extract_spots(spark: SparkSession) -> DataFrame:
    """Fan-out fetch the four spot pages (offline replay) and extract the
    typed spot struct per page."""
    fetched = fanout_fetch(
        spark,
        list(ZWEMWATER_IDS),
        url_for_key=lambda sid: f"fixture://{sid}",
        fetcher=file_fetcher(spot_fixture_mapping()),
        num_partitions=4,
    )
    return extract_spots(fetched.withColumnRenamed("body", "html"), html_col="html")


@query("http_fanout_spots", oracle=None)  # network-shaped op → rows-only
def http_fanout_spots(spark: SparkSession, sf_dir: str) -> DataFrame:
    spots = fetch_and_extract_spots(spark)
    return spots.select(
        "key",
        "status",
        "place",
        F.size(F.map_keys(F.coalesce("general_info", F.create_map()))).alias("n_info"),
        F.coalesce(F.size("facilities"), F.lit(0)).alias("n_facilities"),
        F.coalesce(F.size("chart_titles"), F.lit(0)).alias("n_charts"),
    )


def run_offline_pipeline(spark: SparkSession) -> DataFrame:
    """Full pipeline → one-row DataFrame (prompt, completion, prompt_sha256).

    Deterministic by construction: fixture inputs, stub completer, sorted
    spot records. The report sink (sinks.write_report_html) turns the row
    into the final HTML page.
    """
    water_data = json.loads((FIXTURES_DIR / "waterinfo_detail.json").read_text())
    water_messages = json.loads((FIXTURES_DIR / "watermessages.json").read_text())

    spots = fetch_and_extract_spots(spark)
    spot_rows = sorted(
        spots.select("key", "place", "general_info", "description", "facilities").collect(),
        key=lambda r: r["key"],
    )
    safety_data = {
        "safetyMessages": [
            {
                "place": r["place"],
                "general_info": dict(r["general_info"] or {}),
                "description": r["description"],
                "facilities": list(r["facilities"] or []),
            }
            for r in spot_rows
        ]
    }
    prompt = render_prompt(water_data, water_messages, safety_data)
    prompts = spark.createDataFrame([(prompt,)], "prompt string")
    enriched = enrich_with_llm(prompts, prompt_col="prompt", out_col="completion")
    return enriched.select(
        "prompt", "completion", F.sha2("prompt", 256).alias("prompt_sha256")
    )


@query("pipeline_report_offline", oracle=None)  # LLM/enrich path → rows-only
def pipeline_report_offline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_offline_pipeline(spark)
