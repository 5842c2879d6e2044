"""Sources: the engine's scan surface (SURVEY.md §2.1 S1-S4).

The driver testdata is a TPC-H-ish star schema plus ``events`` (stream-
shaped), ``documents`` and ``embeddings`` (training-data pipeline tables),
one parquet file per table (TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown / column
pruning / partition pruning (reference relied on the same via Iceberg
manifests, ``docs/README.md:123-129``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["TABLES", "load_table", "register_star_schema", "read_csv", "read_json"]

#: every table the driver materializes (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: small dimensions worth broadcast-joining at any scale factor
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema table (S1). Pushdown-friendly: no caching,
    no schema mangling — the parquet footer schema is authoritative.

    Exception: ``events.ts`` — the driver has shipped it both as
    TIMESTAMP(NANOS) (which Spark's parquet reader rejects; read as
    nano-longs and floored to microseconds) and as plain timestamp[us]
    (read as TIMESTAMP_NTZ). Both layouts are normalized to a session-UTC
    TIMESTAMP so downstream plans see one type regardless of vintage
    (same normalization the reference applies for Athena's timestamp(6),
    SURVEY §1.2)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # Legacy ns-as-long layout. INTEGER division: `/ 1000` would
            # promote the epoch-ns long (~1.7e18, above double's 2^53
            # exact range) to double and drift the floor by ±1µs on most
            # rows — `div` keeps it exact and bit-identical to DuckDB's
            # ns→µs truncation of the same files.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # timestamp[us] layout: cast NTZ → session-tz TIMESTAMP (the
            # session is pinned to UTC, so the wall-clock value — and the
            # DuckDB oracle's naive read of the same file — is unchanged).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (S2) and return the
    DataFrames. Views make the SQL path (``spark.sql``) equivalent to the
    DataFrame path — same Catalyst plan either way."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """CSV source (S4; reference tutorial feed ``create_dummy_deltas.py:6``).
    Explicit schema preferred — ``inferSchema`` double-scans the input."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    """JSON-lines source. Schema required for production use (inference
    scans twice and can mistype sparse columns)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)
