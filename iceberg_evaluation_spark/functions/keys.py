"""Key synthesis (SURVEY.md §2.4 M7).

The reference hashes composite business keys to a synthetic ``pk`` with
``md5(concat_ws('-', *cols))`` (``src/tpcds_generator/generate_tpcds.py:144-146``).
Same construction here — JVM-side built-ins, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["composite_pk", "md5_bucket"]


def composite_pk(*cols: str | Column) -> Column:
    """``md5(concat_ws('-', c1, c2, ...))`` — deterministic synthetic key.

    Non-string columns are cast by ``concat_ws`` exactly as SQL string
    casts, so the hash is reproducible from any engine that renders the
    same canonical text (DuckDB oracle parity verified in tests).
    """
    return F.md5(F.concat_ws("-", *[F.col(c) if isinstance(c, str) else c for c in cols]))


def md5_bucket(col: str | Column, modulus: int, hex_width: int = 8) -> Column:
    """Engine-portable deterministic bucket:
    ``conv(substr(md5(x), 1, hex_width), 16, 10) % modulus``.

    The DuckDB twin is ``CAST(('0x' || substr(md5(x), 1, w)) AS BIGINT)
    % m`` — the idiom every oracle-checked operator that needs a
    portable hash builds on (dataset split, mixture resampling,
    stratified sampling, DSIR buckets, bloom positions). ``hex_width``
    must stay <= 15 so the value fits a signed 64-bit int.
    """
    if not 1 <= hex_width <= 15:
        raise ValueError("hex_width must be in [1, 15] to fit a signed long")
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, hex_width), 16, 10).cast("bigint") % modulus
