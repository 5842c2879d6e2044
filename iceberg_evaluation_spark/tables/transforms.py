"""Hidden-partitioning transforms for :class:`SnapshotTable`.

Iceberg's headline scan feature (spec §"Partition Transforms";
reference tables declare only identity date partitioning —
``utils/metadata/store_sales.json:105-107`` — but the Iceberg runtime
the reference benchmarks against ships ``days``/``months``/``years``/
``hours``/``bucket``/``truncate``): the table PARTITIONS on a value
*derived* from a source column, queries keep filtering on the SOURCE
column, and the scan planner translates those predicates through the
transform to prune partitions — the user never names the layout.

Design (engine-local, Spark-first):

* A partition-spec entry is either a bare column name (identity —
  the pre-existing behavior, unchanged) or a transform string:
  ``"days(ts)"``, ``"hours(ts)"``, ``"months(ts)"``, ``"years(ts)"``,
  ``"bucket(16, user_id)"``, ``"truncate(4, name)"``.
* The derived value becomes a **self-describing directory column**
  (``ts_day=19787``, ``user_id_bucket16=3``, ``name_trunc4=abcd``):
  the dir name carries the transform AND its parameter, so files
  written under different spec eras each prune by their own layout —
  the same per-file matching rule identity pruning already uses.
* Derived columns exist ONLY in directory names: Spark's
  ``partitionBy`` removes them from data files, and the snapshot
  schema never contains them (reads ``select`` the schema columns,
  dropping whatever partition discovery appends).
* Time transforms are defined on the UTC epoch (``days`` = floor of
  epoch seconds / 86400, etc.) so write-side Spark expressions and
  driver-side literal evaluation agree regardless of session
  timezone. ``bucket`` uses Spark's own ``F.hash`` (Murmur3_x86_32,
  seed 42) JVM-side and a byte-exact Python mirror driver-side —
  parity is property-pinned in ``tests/test_transforms.py``.

Predicate translation (all conservative — a file is dropped only when
its single transform value is provably disjoint from the predicate):

=============  =====================================================
op             keep file with transform value ``fv`` iff
=============  =====================================================
``=``          ``fv == t(val)``
``in``         ``fv in {t(v) for v in val}``
``<``/``<=``   ``fv <= t(val)``   (t monotone, values truncated down)
``>``/``>=``   ``fv >= t(val)``
``between``    ``t(lo) <= fv <= t(hi)``
=============  =====================================================

``bucket`` is not order-preserving, so only ``=``/``in`` translate;
range predicates keep the file (footer min/max stats on the raw
column still apply — transform dirs and stats pruning compose).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, functions as F

__all__ = [
    "PartitionField",
    "parse_spec",
    "parse_spec_list",
    "dir_field_for",
    "spark_hash32",
]

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)

# ---------------------------------------------------------------------------
# Murmur3_x86_32 — byte-exact Python mirror of Spark's `F.hash` (seed 42).
# Public algorithm (Austin Appleby, public domain; Spark's
# sql/catalyst Murmur3Hash / common/unsafe Murmur3_x86_32).
# ---------------------------------------------------------------------------
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _to_signed32(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


def _hash_int32(v: int, seed: int = 42) -> int:
    """Spark ``hashInt``: one 4-byte block."""
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    return _to_signed32(_fmix(h1, 4))


def _hash_int64(v: int, seed: int = 42) -> int:
    """Spark ``hashLong``: low word then high word."""
    v &= 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    return _to_signed32(_fmix(h1, 8))


def _hash_bytes(b: bytes, seed: int = 42) -> int:
    """Spark ``hashUnsafeBytes``: little-endian 4-byte blocks, then the
    tail one SIGN-EXTENDED byte at a time (each mixed as a full block —
    this is Spark's quirk, not canonical murmur3 tail handling)."""
    n = len(b)
    aligned = n - n % 4
    h1 = seed & _M32
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(b[i : i + 4], "little")))
    for i in range(aligned, n):
        byte = b[i]
        if byte >= 128:
            byte -= 256  # Java byte → int sign extension
        h1 = _mix_h1(h1, _mix_k1(byte & _M32))
    return _to_signed32(_fmix(h1, n))


def spark_hash32(value: Any, simple_type: str) -> int:
    """Driver-side mirror of ``F.hash(col)`` for one non-null literal of
    a column with Spark ``simpleString`` type ``simple_type``."""
    if simple_type in ("tinyint", "smallint", "int"):
        return _hash_int32(int(value))
    if simple_type == "bigint":
        return _hash_int64(int(value))
    if simple_type == "string":
        return _hash_bytes(str(value).encode("utf-8"))
    if simple_type == "date":
        return _hash_int32(_as_epoch_days(value))
    if simple_type == "timestamp":
        return _hash_int64(_as_epoch_micros(value))
    raise ValueError(
        f"bucket transform unsupported for source type {simple_type!r} "
        "(int/bigint/string/date/timestamp)"
    )


# ---------------------------------------------------------------------------
# literal coercion — transforms are evaluated driver-side over filter
# literals; accept the natural Python spellings of each source type.
# ---------------------------------------------------------------------------
def _as_datetime(v: Any) -> _dt.datetime:
    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        return _dt.datetime.fromisoformat(v)
    raise TypeError(f"cannot interpret {v!r} as a timestamp literal")


def _as_epoch_seconds(v: Any) -> int:
    """Floor epoch seconds, matching Spark's ``CAST(ts AS LONG)``
    (``Math.floorDiv(micros, 1_000_000)``). Naive datetimes are UTC —
    the same convention Spark's internal micros use."""
    dt = _as_datetime(v)
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    delta = dt - _EPOCH_DT
    # timedelta normalizes so .days*86400 + .seconds floors negatives too
    return delta.days * 86400 + delta.seconds


def _as_epoch_micros(v: Any) -> int:
    dt = _as_datetime(v)
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    delta = dt - _EPOCH_DT
    return (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds


def _as_epoch_days(v: Any) -> int:
    if isinstance(v, _dt.datetime):
        return (v.date() - _EPOCH_DATE).days
    if isinstance(v, _dt.date):
        return (v - _EPOCH_DATE).days
    if isinstance(v, str):
        return (_dt.date.fromisoformat(v[:10]) - _EPOCH_DATE).days
    raise TypeError(f"cannot interpret {v!r} as a date literal")


def _as_date(v: Any) -> _dt.date:
    return _EPOCH_DATE + _dt.timedelta(days=_as_epoch_days(v))


# ---------------------------------------------------------------------------
# transform field
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class PartitionField:
    """One partition-spec entry: ``transform(source) -> dir column``."""

    spec: str  # canonical spec string as stored in snapshot metadata
    transform: str  # identity | days | hours | months | years | bucket | truncate
    source: str  # source column name
    param: int | None = None  # bucket N / truncate W

    # -- naming ----------------------------------------------------------
    @property
    def dir_name(self) -> str:
        if self.transform == "identity":
            return self.source
        if self.transform == "bucket":
            return f"{self.source}_bucket{self.param}"
        if self.transform == "truncate":
            return f"{self.source}_trunc{self.param}"
        suffix = {"days": "day", "hours": "hour", "months": "month", "years": "year"}
        return f"{self.source}_{suffix[self.transform]}"

    @property
    def is_identity(self) -> bool:
        return self.transform == "identity"

    # -- write side ------------------------------------------------------
    def expr(self, source_type: str) -> Column:
        """JVM-side derivation of the dir column from the source column
        (``source_type`` = Spark ``simpleString`` of the source)."""
        c = F.col(self.source)
        t = self.transform
        if t == "identity":
            return c
        if t == "bucket":
            self._check_bucket_type(source_type)
            return F.pmod(F.hash(c), F.lit(self.param)).cast("int")
        if t == "truncate":
            if source_type in ("tinyint", "smallint", "int", "bigint"):
                return (c - F.pmod(c, F.lit(self.param))).cast("bigint")
            if source_type == "string":
                return F.substring(c, 1, int(self.param or 0))
            raise ValueError(
                f"truncate transform unsupported for {source_type!r}"
            )
        # time transforms — all derived from the UTC epoch so the
        # Spark expression and eval_literal agree in any session tz
        if source_type == "timestamp":
            secs = c.cast("long")
            if t == "days":
                return F.floor(secs / 86400).cast("int")
            if t == "hours":
                return F.floor(secs / 3600).cast("int")
            d = F.date_add(F.lit(_EPOCH_DATE), F.floor(secs / 86400).cast("int"))
        elif source_type == "date":
            if t == "days":
                return F.datediff(c, F.lit(_EPOCH_DATE)).cast("int")
            if t == "hours":
                raise ValueError("hours transform needs a timestamp source")
            d = c
        else:
            raise ValueError(
                f"{t} transform needs a timestamp/date source, got {source_type!r}"
            )
        if t == "months":
            return ((F.year(d) - 1970) * 12 + F.month(d) - 1).cast("int")
        return (F.year(d) - 1970).cast("int")  # years

    @staticmethod
    def _check_bucket_type(source_type: str) -> None:
        if source_type not in ("tinyint", "smallint", "int", "bigint",
                               "string", "date", "timestamp"):
            raise ValueError(
                f"bucket transform unsupported for source type {source_type!r}"
            )

    # -- driver side -----------------------------------------------------
    def eval_literal(self, v: Any, source_type: str) -> Any:
        """Transform one non-null filter literal exactly as :meth:`expr`
        transforms column values (parity property-pinned)."""
        t = self.transform
        if t == "identity":
            return v
        if t == "bucket":
            return spark_hash32(v, source_type) % int(self.param or 1)
        if t == "truncate":
            if source_type == "string":
                return str(v)[: int(self.param or 0)]
            return int(v) - (int(v) % int(self.param or 1))
        if source_type == "date":
            d = _as_date(v)
            if t == "days":
                return (d - _EPOCH_DATE).days
            if t == "months":
                return (d.year - 1970) * 12 + d.month - 1
            if t == "years":
                return d.year - 1970
            raise ValueError("hours transform needs a timestamp source")
        secs = _as_epoch_seconds(v)
        if t == "days":
            return secs // 86400
        if t == "hours":
            return secs // 3600
        d = _EPOCH_DATE + _dt.timedelta(days=secs // 86400)
        if t == "months":
            return (d.year - 1970) * 12 + d.month - 1
        return d.year - 1970  # years

    def parse_dir_value(self, raw: str, source_type: str) -> Any:
        """Typed value of this field's ``dir_name=raw`` segment."""
        if self.transform == "identity":
            raise ValueError("identity fields use the table's own parser")
        if self.transform == "truncate" and source_type == "string":
            return raw
        return int(raw)

    # -- predicate translation ------------------------------------------
    def file_may_match(self, fv: Any, op: str, val: Any, source_type: str) -> bool:
        """Can a file whose transform value is ``fv`` hold rows
        satisfying ``source op val``? Conservative: uncertain → True."""
        t = self.eval_literal
        try:
            if op == "=":
                return fv == t(val, source_type)
            if op == "in":
                return any(fv == t(v, source_type) for v in val)
            if self.transform == "bucket":
                return True  # not order-preserving
            if op == "between":
                lo, hi = val
                return t(lo, source_type) <= fv <= t(hi, source_type)
            if op in ("<", "<="):
                return fv <= t(val, source_type)
            if op in (">", ">="):
                return fv >= t(val, source_type)
        except (TypeError, ValueError):
            return True  # untransformable literal → keep
        return True


# ---------------------------------------------------------------------------
# spec parsing
# ---------------------------------------------------------------------------
_TIME_RE = re.compile(r"^(days?|hours?|months?|years?)\s*\(\s*(\w+)\s*\)$")
_PARAM_RE = re.compile(r"^(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)$")
_TIME_CANON = {
    "day": "days", "days": "days", "hour": "hours", "hours": "hours",
    "month": "months", "months": "months", "year": "years", "years": "years",
}


def parse_spec(spec: str) -> PartitionField:
    """``"col"`` | ``"days(col)"`` | ``"bucket(16, col)"`` | … →
    :class:`PartitionField`. Unknown ``fn(...)`` shapes raise."""
    s = spec.strip()
    m = _TIME_RE.match(s)
    if m:
        t = _TIME_CANON[m.group(1)]
        return PartitionField(spec=f"{t}({m.group(2)})", transform=t,
                              source=m.group(2))
    m = _PARAM_RE.match(s)
    if m:
        n = int(m.group(2))
        if n <= 0:
            raise ValueError(f"{m.group(1)} parameter must be positive: {spec!r}")
        return PartitionField(
            spec=f"{m.group(1)}({n}, {m.group(3)})", transform=m.group(1),
            source=m.group(3), param=n,
        )
    if "(" in s or ")" in s:
        raise ValueError(f"unknown partition transform {spec!r}")
    return PartitionField(spec=s, transform="identity", source=s)


def parse_spec_list(specs: list[str] | None) -> list[PartitionField]:
    return [parse_spec(s) for s in (specs or [])]


# self-describing dir-name recognition for pruning: does segment name
# `name` denote a transform of filter column `col`? Returns the field or
# None. (Identity matches are handled by the table's own exact-name path.)
_DIR_RE_TMPL = r"^{col}_(day|hour|month|year|bucket(\d+)|trunc(\d+))$"


def dir_field_for(col: str, seg_name: str) -> PartitionField | None:
    m = re.match(_DIR_RE_TMPL.format(col=re.escape(col)), seg_name)
    if not m:
        return None
    kind = m.group(1)
    if kind.startswith("bucket"):
        return PartitionField(spec=f"bucket({m.group(2)}, {col})",
                              transform="bucket", source=col,
                              param=int(m.group(2)))
    if kind.startswith("trunc"):
        return PartitionField(spec=f"truncate({m.group(3)}, {col})",
                              transform="truncate", source=col,
                              param=int(m.group(3)))
    return PartitionField(spec=f"{_TIME_CANON[kind]}({col})",
                          transform=_TIME_CANON[kind], source=col)
