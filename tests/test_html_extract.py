"""Golden-output tests for the HTML-extract operator (FIXTURES.md §B3):
field-for-field reproduction of the reference's parse semantics
(src/rotterdam_swimming_advice.py:52-95) on stored fixture pages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rws_data_ingester_spark.functions.html_extract import parse_spot_html, extract_spots

from tests.conftest import FIXTURES


def _load(name: str) -> str:
    return (FIXTURES / name).read_text()


def test_parse_full_spot():
    out = parse_spot_html(_load("zwemwater_22003.html"))
    assert out["place"] == "Kralingse Plas"
    assert out["general_info"] == {
        "Status": "In orde",
        "Adres": "Plaszoom 4, Rotterdam",
        "Seizoen": "1 mei - 30 september",
    }
    assert out["description"] == (
        "Een populaire zwemplek in Rotterdam.\nHet water wordt regelmatig gecontroleerd."
    )
    assert out["facilities"] == ["Zandstrand", "Toiletten", "Horeca"]
    assert out["chart_titles"] == ["Waterkwaliteit", "Temperatuur"]
    assert out["_corrupt_record"] is None


def test_parse_minimal_spot():
    out = parse_spot_html(_load("zwemwater_22005.html"))
    assert out["place"] == "Wylerbergmeer"
    assert out["general_info"] == {"Status": "In orde"}
    assert out["facilities"] == ["Speeltuin", "Parkeren"]
    assert out["chart_titles"] == []


def test_parse_degenerate_html_defaults():
    # No extractable structure → reference-style defaults, not a crash
    out = parse_spot_html(_load("zwemwater_22001.html"))
    assert out["place"] == "Unknown"
    assert out["general_info"] == {}
    assert out["facilities"] == []


def test_parse_error_branch_captures_record():
    # Non-string input trips the except branch (reference :94-95 analog)
    out = parse_spot_html(12345)  # type: ignore[arg-type]
    assert out["place"] is None
    assert out["_corrupt_record"] is not None


def test_extract_spots_dataframe(spark):
    rows = [(sid, _load(f"zwemwater_{sid}.html")) for sid in ("22003", "23762")]
    df = spark.createDataFrame(rows, "key string, html string")
    out = {r["key"]: r for r in extract_spots(df).collect()}
    assert out["22003"]["place"] == "Kralingse Plas"
    assert out["22003"]["general_info"]["Status"] == "In orde"
    assert out["23762"]["place"] == "Zevenhuizerplas"
    assert out["23762"]["general_info"]["Status"] == "Waarschuwing blauwalg"
    assert out["23762"]["facilities"] == ["Strand"]
