"""Order-independent, engine-portable money aggregation.

Two portability hazards with ``round(sum(double), 2)``:

1. **Accumulation order** — Spark partial aggregation and DuckDB parallel
   aggregation add doubles in different orders, so big sums drift in the
   last ulps and can flip a rounded cent.
2. **Midpoint rounding** — Spark's ``round`` does HALF_UP on the *shortest
   decimal representation* (Java ``BigDecimal.valueOf``), DuckDB rounds
   the binary value; an integer-cents sum divided by a power of ten lands
   exactly on ``x.xx5`` midpoints where the two disagree
   (e.g. round(548108.065, 2): Spark → .07, DuckDB → .06).

Both are eliminated by integer arithmetic: all source money columns are
≤2dp decimals stored as double (verified against the testdata; products
of two 2dp columns are 4dp), so per-row values scale to exact BIGINT,
sums are exact and order-independent, and half-up rounding is done with
integer add/mod before one final exact division.

Headroom: |row| ≤ 1e5 × scale 1e4 = 1e9 → int64 carries ~9e9 such rows
per group; quotients stay < 2^53 so the closing double division is exact.
Sums are assumed non-negative (revenues/prices/quantities).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["cents", "exact_sum", "exact_avg", "sql_sum", "sql_avg"]


def cents(expr: Column, scale: int = 100) -> Column:
    """Per-row exact integer scaling (the per-row double is bit-identical
    across engines; only aggregation order diverges)."""
    return F.round(expr * scale, 0).cast("bigint")


def exact_sum(expr: Column, scale: int = 100, dp: int = 2) -> Column:
    """round(sum(expr), dp) computed exactly and portably."""
    target = 10**dp
    s = F.sum(cents(expr, scale))
    if scale == target:
        return s / float(target)  # exact dp-decimal double, no rounding step
    div = scale // target
    t = s + F.lit(div // 2)
    return ((t - t % div) / div) / float(target)  # integer half-up


def exact_avg(expr: Column, scale: int = 100, dp: int = 2) -> Column:
    """round(avg(expr), dp). The divisor (group count) virtually always has
    prime factors other than 2/5, so the quotient's shortest repr never
    terminates at a dp-midpoint — plain round is portable here."""
    return F.round(F.sum(cents(expr, scale)) / float(scale) / F.count(expr), dp)


def _sql_cents(e: str, scale: int) -> str:
    return f"sum(CAST(round(({e}) * {scale}, 0) AS BIGINT))"


def sql_sum(e: str, scale: int = 100, dp: int = 2) -> str:
    target = 10**dp
    s = _sql_cents(e, scale)
    if scale == target:
        return f"({s} / {target}.0)"
    div = scale // target
    t = f"({s} + {div // 2})"
    return f"((({t} - {t} % {div}) / {div}) / {target}.0)"


def sql_avg(e: str, scale: int = 100, dp: int = 2) -> str:
    return f"round({_sql_cents(e, scale)} / {scale}.0 / count({e}), {dp})"
