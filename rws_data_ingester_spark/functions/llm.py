"""LLM enrichment operator (SURVEY.md §2.10 [REF] LLM-enrich UDF).

The reference does one synchronous chat completion per run against an
OpenAI-compatible endpoint with a fixed model and temperature
(src/rotterdam_swimming_advice.py:22-23,230-245). Here the semantic is
per-row enrichment at scale: ``mapInPandas`` so each Arrow batch of
prompts is handled by one Python worker, with batching, retry, and an
injectable completion function.

Offline default is the deterministic stub from FIXTURES.md §B5:
``"<div>STUB:" + sha256(prompt) + "</div>"`` — hash-checkable without a
network. Live mode (``completer="openai"``) keeps the reference's config
surface (endpoint, model, temperature) injectable and is import-gated.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stub_complete(prompt: str) -> str:
    return "<div>STUB:" + hashlib.sha256(prompt.encode("utf-8")).hexdigest() + "</div>"


def make_openai_completer(
    base_url: str | None = None,
    model: str = "deepseek-chat",
    temperature: float = 0.3,
    max_retries: int = 3,
) -> Callable[[str], str]:
    """Live completer mirroring the reference's client config (:22-23,
    :241,:243). Import-gated: raises if the openai package is absent."""
    import openai  # noqa: F401 — not installed in the test runtime; live-mode only

    client = openai.OpenAI(
        api_key=os.environ.get("OPENAI_API_KEY", ""),
        base_url=base_url or os.environ.get("LLM_BASE_URL", "https://api.deepseek.com"),
        max_retries=max_retries,
    )

    def complete(prompt: str) -> str:
        response = client.chat.completions.create(
            model=model,
            messages=[{"role": "user", "content": prompt}],
            temperature=temperature,
        )
        return response.choices[0].message.content

    return complete


def enrich_with_llm(
    df: DataFrame,
    prompt_col: str = "prompt",
    out_col: str = "completion",
    completer: Callable[[str], str] | None = None,
    batch_size: int = 64,
) -> DataFrame:
    """Per-row LLM enrichment via mapInPandas (Arrow-batched).

    The completer is resolved INSIDE the worker function so only its
    closure (a picklable callable or None) ships to executors. Batch size
    bounds peak in-flight rows per worker — the rate-limit/batching knob
    SURVEY §4.3(1) calls for.
    """
    out_schema = ", ".join(
        [f"`{name}` {dtype}" for name, dtype in df.dtypes] + [f"`{out_col}` string"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = completer or stub_complete
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                chunk[out_col] = [fn(p) for p in chunk[prompt_col]]
                yield chunk

    return df.mapInPandas(run, schema=out_schema)
