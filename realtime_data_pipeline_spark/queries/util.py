"""Oracle-parity numeric helpers.

Double-precision SUM/AVG are order-dependent: Spark and DuckDB can land on
different last-ulp values, and ROUND(x, 2) near a .xx5 boundary then flips a
cent and breaks the driver's exact value-hash. The fix (both sides, always):

1. cast each input value to DECIMAL(38,10) — deterministic, engine-identical
   rounding of the double's decimal expansion;
2. SUM the decimals — exact, order-independent;
3. round / divide, then cast back to DOUBLE so pandas renders float64 on
   both sides (a Decimal object vs float64 would hash-mismatch).

SQL twin patterns (use verbatim in ORACLE_SQL):

    CAST(ROUND(SUM(CAST(x AS DECIMAL(38,10))), 2) AS DOUBLE)          -- dsum
    ROUND(CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 4) -- davg
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded sum of a double column (alias it yourself)."""
    return F.round(F.sum(col.cast(DEC)), scale).cast("double")


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent rounded average: exact decimal sum, double divide."""
    return F.round(F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1)), scale)
