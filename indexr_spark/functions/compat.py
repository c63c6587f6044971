"""Reference-compatibility expression builders.

Small semantic deltas between the reference engine and Spark SQL,
packaged as explicit functions so a migrating user can opt into
bit-identical behavior instead of silently inheriting Spark's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def indexr_div(a: Column, b: Column) -> Column:
    """Division with divide-by-zero → 0.

    The reference's integer divide returns 0 on a zero divisor
    (indexr-query-opt expr/arith/Divide.java — SURVEY.md §2.1 scalar
    table) where Spark SQL returns NULL. This builder reproduces the
    reference's answer for both integral and floating inputs.
    """
    return F.when(b == 0, F.lit(0)).otherwise(a / b)


def indexr_mod(a: Column, b: Column) -> Column:
    """Remainder with zero divisor → 0 (same contract as indexr_div;
    reference expr/arith/Remainder.java)."""
    return F.when(b == 0, F.lit(0)).otherwise(a % b)
