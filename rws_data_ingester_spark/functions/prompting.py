"""Prompt-assembly operator (SURVEY.md §2.10 [REF] prompt-assembly).

Deterministic doc→string templating reproducing the semantics of the
reference's ``create_prompt`` (src/rotterdam_swimming_advice.py:158-227):

- water level  = latest.data, default "N/A"                      (:169)
- wind         = first related[] item whose label contains
                 "Windsnelheid", default {}                       (:170-177)
- temperature  = first related[] item whose label contains
                 "Watertemperatuur", default {}                   (:178-185)
- message lines "- {title}: {bannerText}", or the single line
  "- No official messages" when empty                             (:188-190)
- all interpolated into a fixed advice-prompt template            (:192-225)

Two forms: a pure-Python renderer (driver-side, used by the report
pipeline whose cardinality is 1 row by construction) and a columnar
builder composed of coalesce/filter/transform/concat_ws — the distributed
form for when prompts are built per-row over millions of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROMPT_TEMPLATE = """You are an assistant that provides swimming advice in Rotterdam.
The language of the advice should be English except for names.

Generate an HTML response with two clearly separated sections.
Only return the content inside a <div>; no boilerplate, no code fences.

1. Rijnhaven Advice:
- Use the following data:
    - Water temperature: {temp} °C
    - Water level: {level} cm (relative to NAP)
    - Wind speed: {wind} m/s
    - Official safety messages from Rijkswaterstaat:
{rws_summary}

2. Water Safety Notes:
- Based on recent data from Zwemwater.nl:
{safety_data}

Format the HTML in a clean and friendly manner.
At the end, note that this advice is AI-generated from public data sources."""


def _first_related(related: list[dict] | None, needle: str) -> dict:
    for item in related or []:
        if needle in item.get("label", ""):
            return item
    return {}


def render_prompt(
    water_data: dict, water_messages: dict, safety_data: dict
) -> str:
    """Driver-side renderer — the direct analog of the reference pipeline's
    single-row prompt build."""
    level = (water_data.get("latest") or {}).get("data", "N/A")
    wind = _first_related(water_data.get("related"), "Windsnelheid")
    temp = _first_related(water_data.get("related"), "Watertemperatuur")
    msgs = water_messages.get("messages") or []
    lines = [f"- {m['title']}: {m['bannerText']}" for m in msgs]
    rws_summary = "\n".join(lines) if lines else "- No official messages"
    return PROMPT_TEMPLATE.format(
        temp=temp.get("data", "N/A"),
        level=level,
        wind=wind.get("data", "N/A"),
        rws_summary=rws_summary,
        safety_data=safety_data,
    ).strip()


def prompt_column(
    level_col: str = "latest.data",
    related_col: str = "related",
    messages_col: str = "messages",
    safety_col: str = "safety_repr",
) -> F.Column:
    """Columnar prompt builder: the same extraction semantics as
    render_prompt, expressed as Catalyst expressions (filter/element_at
    over the related[] array ≈ the reference's first-match scan :170-185;
    coalesce ≈ its 'N/A' defaults :169,207,209)."""
    level = F.coalesce(F.col(level_col), F.lit("N/A"))
    first = lambda needle: F.element_at(  # noqa: E731
        F.expr(f"filter({related_col}, x -> contains(x.label, '{needle}'))"), 1
    )
    wind = F.coalesce(first("Windsnelheid").getField("data"), F.lit("N/A"))
    temp = F.coalesce(first("Watertemperatuur").getField("data"), F.lit("N/A"))
    lines = F.expr(
        f"transform({messages_col}, m -> concat('- ', m.title, ': ', m.bannerText))"
    )
    rws_summary = F.when(F.size(lines) > 0, F.array_join(lines, "\n")).otherwise(
        F.lit("- No official messages")
    )
    template = PROMPT_TEMPLATE.replace("%", "%%")
    for key in ("temp", "level", "wind", "rws_summary", "safety_data"):
        template = template.replace("{" + key + "}", "%s", 1)
    return F.format_string(template, temp, level, wind, rws_summary, F.col(safety_col))


def build_prompts(df: DataFrame, out_col: str = "prompt", **kwargs) -> DataFrame:
    return df.withColumn(out_col, prompt_column(**kwargs))
