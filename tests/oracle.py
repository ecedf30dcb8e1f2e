"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each declared query in Spark AND its oracle SQL in DuckDB on
the same parquet, then compares row-count + schema + order-insensitive
value-hash (columns sorted by name). This module reproduces that check so
mismatches surface in `pytest` before the driver ever sees them.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from transf_spark.schemas import TABLE_NAMES

_EPS = 0.0  # exact float compare — parity engineering, not tolerance


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


# DuckDB result types the driver's pandas canonicalizer silently corrupts:
# HUGEINT/UHUGEINT (int128 → float64, so 12345 hashes as "12345.0") and
# UBIGINT (uint64 → can exceed int64; pandas widens to float64 or object).
# Spark can emit none of these, so any oracle producing one is a guaranteed
# driver hash-mismatch even with identical values (round-4 verdict: five
# red rows shipped behind a type-blind fetchall() here). CAST to BIGINT /
# DOUBLE in the oracle SQL instead.
_DRIVER_UNHASHABLE_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass).

    Array/map/struct-typed output columns are REJECTED outright: the
    driver's canonicalizer sorts pandas object columns and dies on
    unhashable ndarrays, so the local gate must be at least as strict
    (round-1 lesson — two driver-only failures hid behind a lenient
    list→tuple normalization here). Serialize such columns (``to_json``)
    in the query itself.

    Likewise any DuckDB output column whose type Spark cannot emit
    (HUGEINT & friends) is rejected BEFORE value comparison: this module
    fetches Python ints via ``fetchall()`` (type-blind, int128-exact)
    while the driver canonicalizes through pandas (int128 → float64), so
    a value-equal comparison here would pass where the driver's hash
    fails — the round-4 failure mode.
    """
    problems: list[str] = []
    from pyspark.sql import types as T

    for f in spark_df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            problems.append(
                f"column {f.name!r} has non-scalar type {f.dataType.simpleString()} — "
                "the driver canonicalizer cannot hash it; emit to_json(...) instead"
            )
    if problems:
        return problems

    rel = con.sql(sql)
    for col, typ in zip(rel.columns, rel.types):
        if str(typ).upper() in _DRIVER_UNHASHABLE_DUCK_TYPES:
            problems.append(
                f"oracle column {col!r} has DuckDB type {typ} — pandas coerces it "
                "to float64 in the driver's canonicalizer (hash mismatch vs Spark "
                "LongType); CAST(... AS BIGINT) in the oracle SQL"
            )
    if problems:
        return problems

    spark_cols = sorted(spark_df.columns)
    sdf = spark_df.select(*spark_cols)
    srows = [tuple(_norm(v) for v in r) for r in sdf.collect()]

    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows_raw = res.fetchall()
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    dcols_sorted = [dcols[i] for i in order]
    drows = [tuple(_norm(r[i]) for i in order) for r in drows_raw]

    if spark_cols != dcols_sorted:
        problems.append(f"column mismatch: spark={spark_cols} duckdb={dcols_sorted}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count: spark={len(srows)} duckdb={len(drows)}")
    s_sorted = sorted(srows, key=_key)
    d_sorted = sorted(drows, key=_key)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        # TYPED comparison, not ==: Python says 1 == 1.0, but the driver
        # hashes pandas-canonicalized text where int64 prints "1" and
        # float64 prints "1.0" — a BIGINT-vs-DOUBLE column skew with equal
        # values passes == here and still fails the driver (same blindness
        # class as the round-4 HUGEINT bug, one level down).
        if _key(a) != _key(b):
            n_bad += 1
            if n_bad <= 5:
                problems.append(f"row {i}: spark={a!r} duckdb={b!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
