"""pround ≡ DuckDB round(x, d), bit-for-bit, over a boundary-heavy value
battery — the contract every rounded output column in the engine relies
on (see functions/rounding.py for why Spark's own round() diverges).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from rws_data_ingester_spark.functions.rounding import pround


def _battery() -> list[float]:
    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            rng.uniform(-2e6, 2e6, 4000),
            # discrete pools: the halfway-prone shapes the fuzz generates
            rng.randint(-8_000_000, 8_000_000, 4000) * 0.25,
            rng.randint(-8_000_000, 8_000_000, 4000) * 0.25
            / rng.randint(1, 50, 4000),
            # hand-picked boundary cases (seed-4026 repro first)
            np.array(
                [
                    1236.475, -1236.475, 0.285, -0.285, 0.145, -0.145,
                    2.5, -2.5, 0.5, -0.5, 0.015, 0.0, -0.0,
                    1e15 + 0.5, 2.0**53, -(2.0**53), 1e300, -1e300,
                ]
            ),
            # double-rounding hazard class (a): the largest double BELOW a
            # decimal halfway at each tested scale — adding 0.5 to these
            # rounds UP in IEEE even though std::round must round DOWN.
            np.array(
                [
                    s * math.nextafter(k + 0.5, -math.inf) / 10.0**d
                    for d in (0, 1, 2, 4, 6)
                    for k in (0.0, 1.0, 2.0, 123.0, 4503.0)
                    for s in (1.0, -1.0)
                ]
            ),
            # hazard class (b): odd-integer products in [2^52, 2^53) —
            # +0.5 on these ties-to-even up a FULL unit of target scale.
            np.array(
                [
                    s * float(2**52 + 2 * j + 1) / 10.0**d
                    for d in (0, 1, 2, 4, 6)
                    for j in (0, 1, 17, 999_999)
                    for s in (1.0, -1.0)
                ]
            ),
        ]
    )
    return [float(v) for v in vals]


@pytest.mark.parametrize("scale", [0, 1, 2, 4, 6])
def test_pround_matches_duckdb_round_bitwise(spark, scale):
    vals = _battery()
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["r"] for r in sdf.select(pround("x", scale).alias("r")).collect()]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT round(v, ?) FROM (SELECT unnest(?) v)", [scale, vals]
        ).fetchall()
    ]
    bad = [
        (v, g, w)
        for v, g, w in zip(vals, got, want)
        # duckdb may emit -0.0; pround normalizes to +0.0 (the F.round
        # convention oracles already compensate for with `+ 0.0`)
        if (g + 0.0) != (w + 0.0) and not (math.isnan(g) and math.isnan(w))
        # above 2^53 pround is the (exact) identity while duckdb's
        # multiply/divide round-trip may sit 1 ulp off — sub-sig=6 noise
        and abs(v) < 2.0**53
    ]
    assert not bad, f"scale={scale}: {bad[:5]}"


def test_pround_null_and_specials(spark):
    sdf = spark.createDataFrame(
        [(None,), (float("nan"),), (float("inf"),), (float("-inf"),)],
        "x double",
    )
    got = [r["r"] for r in sdf.select(pround("x", 2).alias("r")).collect()]
    assert got[0] is None
    assert math.isnan(got[1])
    assert got[2] == float("inf") and got[3] == float("-inf")
