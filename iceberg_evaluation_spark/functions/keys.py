"""Key synthesis (SURVEY.md §2.4 M7).

The reference hashes composite business keys to a synthetic ``pk`` with
``md5(concat_ws('-', *cols))`` (``src/tpcds_generator/generate_tpcds.py:144-146``).
Same construction here — JVM-side built-ins, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["composite_pk"]


def composite_pk(*cols: str | Column) -> Column:
    """``md5(concat_ws('-', c1, c2, ...))`` — deterministic synthetic key.

    Non-string columns are cast by ``concat_ws`` exactly as SQL string
    casts, so the hash is reproducible from any engine that renders the
    same canonical text (DuckDB oracle parity verified in tests).
    """
    return F.md5(F.concat_ws("-", *[F.col(c) if isinstance(c, str) else c for c in cols]))
