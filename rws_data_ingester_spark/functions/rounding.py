"""Portable cross-engine rounding.

Spark's ``round()`` on DOUBLE parses the value's SHORTEST DECIMAL
representation (``Double.toString`` → ``BigDecimal``, HALF_UP), while
DuckDB (and C/C++ ``std::round``-based engines generally) round the
BINARY value — so the engines disagree whenever a double and its
shortest decimal repr sit on opposite sides of a decimal halfway point.
Concrete case (found by the seeded differential fuzz, seed 4026):
``AVG`` of quarter-multiple money over 10 rows = the double nearest
1236.475, whose binary value is a hair BELOW the halfway but whose
shortest repr is exactly "1236.475" — Spark's round(…, 2) says 1236.48,
DuckDB says 1236.47. Not ulp noise: a real 0.01 divergence that no
significant-digit canonicalization can absorb, and discrete value pools
(money in cents/quarters, integer counts) hit it at practical rates.

``pround`` computes round-half-away-from-zero in pure IEEE arithmetic.
The naive ``floor(|x|·10^d + 0.5)`` spelling double-rounds: the ``+0.5``
addition itself rounds, so (a) doubles a hair below a decimal halfway
whose sum rounds up diverge (``0.49999999999999994 + 0.5 == 1.0`` but
std::round gives 0), and (b) odd-integer products in [2^52, 2^53) get
bumped a full unit by ties-to-even (``4503599627370497.0 + 0.5 ==
4503599627370498.0``). Instead we take ``t = |x|·10^d`` (the same one
IEEE multiply DuckDB performs), split it exactly into ``n = t - t%1.0``
(fmod is exact; the subtraction cancels exactly) and the fractional
remainder, and add 1 only when ``t%1.0 >= 0.5`` — an EXACT comparison,
so the result is bit-for-bit DuckDB's ``round(x, d)`` for every finite
double below 2^53 (verified in tests/test_rounding_parity.py over a
120k boundary-heavy battery that now includes both hazard classes).

The floor is spelled ``y - y % 1.0`` (exact for y ≥ 0: the remainder is
computed without rounding and the subtraction cancels exactly) rather
than ``F.floor`` because Spark's floor on DOUBLE casts to BIGINT, which
overflows for |x|·10^d ≥ 2^63 and errors under ANSI. Above 2^53 a double
has no fractional digits at all, so rounding is the identity — returned
directly, which also covers ±Inf; NaN propagates through the same guard.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^53: smallest magnitude where doubles are integer-valued (ulp = 2).
_INTEGRAL = 9007199254740992.0


def pround(col: Column | str, scale: int = 0) -> Column:
    """Round-half-away-from-zero on a DOUBLE column, bit-identical to
    DuckDB's ``round(col, scale)``. NULL→NULL, NaN→NaN, ±Inf→±Inf;
    -0.0 outputs are normalized to 0.0 (matching ``F.round``, whose
    BigDecimal path cannot produce -0.0 — oracles add ``+ 0.0`` where
    a negative can round to zero).

    Cost note: the returned expression references ``col`` five times
    (guard + magnitude + sign), and Catalyst does not common-subexpression
    a non-cheap operand across them — rounding an expensive expression
    (HOF fold, regex scan, array intersect) re-evaluates it per reference.
    Bind such operands to a column in an inner select and round the bound
    column (measured 2.0 s → 0.73 s on the sf0.1 exact-cosine path);
    aggregate results and plain columns are fine to pass directly.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**scale))
    t = F.abs(c) * p
    frac = t % F.lit(1.0)
    # n = floor(t), exactly: fmod is exact and t - frac cancels exactly;
    # n + 1.0 is exact for n < 2^53 (ulp <= 1 there), and for t >= 2^53
    # frac == 0.0 so the +1 branch never fires.
    n = t - frac
    mag = (n + F.when(frac >= F.lit(0.5), F.lit(1.0)).otherwise(F.lit(0.0))) / p
    return F.when(F.isnan(c) | (F.abs(c) >= F.lit(_INTEGRAL)), c).otherwise(
        F.signum(c) * mag + F.lit(0.0)
    )
