"""Shared Column-expression helpers.

Oracle-parity arithmetic: the driver value-hashes Spark output against DuckDB
output. Double summation is order-dependent, and Spark's partial aggregation
order differs run-to-run, so any ``SUM(double)`` is a latent hash mismatch.
All money-ish columns in the fixtures carry exactly 2 decimal digits, so we
sum **exactly** in ``DECIMAL`` and cast the final value back to double — a
deterministic, partitioning-independent result on both engines. This is also
the right call at 100 TB: decimal partial aggregates are still map-side
combinable and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# decimal(12,2) holds |x| < 10^10 with cents precision — covers every price
# column in the fixtures; products of two stay within decimal(38,*) on both
# Spark and DuckDB so multiplication never saturates precision.
MONEY = "decimal(12,2)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: Column | str, alias: str) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count average (double division, same op order as the
    oracle's ``CAST(SUM(dec) AS DOUBLE) / COUNT(*)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(F.lit(1))).alias(alias)


# Canonical-props gate shared by every query that parses the events
# ``props`` JSON bag: only strict-grammar integer-valued single-key
# {"k": N} bags qualify. Simple regex features ONLY (anchors, char
# classes, bounded whitespace, one alternation) so Java regex (Spark
# rlike) and RE2 (DuckDB regexp_matches) agree byte-for-byte. The gate
# runs BEFORE either engine's JSON parser — that is what makes the
# parsers' leniency differences unreachable: Spark's get_json_object
# NULLs malformed JSON where DuckDB's json_extract_string RAISES (even
# under TRY_CAST — e.g. leading-zero integers like {"k":007}), and the
# string→number casts split on fractional text (Spark truncates
# '1.5'→1, DuckDB rounds→2). The integer arm is the STRICT JSON number
# grammar -?(0|[1-9][0-9]*). Oracles add a json_valid(props) guard as
# defense-in-depth so no gate regression can ever reach the raising
# parser (round-9 advisory).
PROPS_CANON_RE = r'^\{"k":[ ]*-?(0|[1-9][0-9]*)\}$'


def sql_props_k_gate(cast_type: str) -> str:
    """DuckDB fragment: the gated extraction of $.k as ``cast_type``."""
    return (
        "CASE WHEN props IS NOT NULL"
        f" AND regexp_matches(props, '{PROPS_CANON_RE}')"
        " AND json_valid(props)"
        f" THEN TRY_CAST(json_extract_string(props, '$.k') AS {cast_type}) END"
    )


def props_k_gate(extracted: Column) -> Column:
    """Spark twin: ``extracted`` evaluated only when props passes the gate."""
    return F.when(F.col("props").rlike(PROPS_CANON_RE), extracted)


# ---- degenerate-double guards for the events.value measure -----------------
#
# events.value is the one FREE-FORM double measure in the fixtures: unlike
# the generator-bounded TPC-H money columns it carries no domain guarantee,
# so a regenerated fixture could hold NaN/±Infinity/overflow doubles. The
# round-14 degenerate-events device showed those split the engines two ways:
# CAST to DECIMAL/BIGINT silently NULLs on Spark (ANSI off) but HARD-ERRORS
# the DuckDB oracle, and percentile vs quantile_cont disagree on NaN
# placement. Each guard below has a textually-mirrored SQL twin; NaN fails
# a `<= bound` comparison in BOTH engines (each orders NaN above every
# value), and ±Infinity/overflow fail the bound itself.

# exact decimal(12,2)-representable range: anything inside round-trips the
# cast on both engines; the first double past it rounds to 13 digits
DEC_REPR_BOUND = "9999999999.99"

SQL_DEC_VALUE_GUARDED = (
    f"CASE WHEN value BETWEEN -{DEC_REPR_BOUND} AND {DEC_REPR_BOUND} "
    f"THEN CAST(value AS DECIMAL(12,2)) END"
)


def dec_value_guarded() -> Column:
    """Spark twin of SQL_DEC_VALUE_GUARDED — keep in lockstep."""
    return F.when(
        F.col("value").between(-9999999999.99, 9999999999.99),
        F.col("value").cast(MONEY),
    )


# finite-double predicate (excludes NaN and ±Infinity), same text both
# dialects — used where a quantile/sketch input must be finite for the
# engines to agree on ordering/interpolation
SQL_FINITE_VALUE = "(NOT isnan(value) AND abs(value) <> CAST('Infinity' AS DOUBLE))"


def finite_value() -> Column:
    """Spark twin of SQL_FINITE_VALUE — keep in lockstep."""
    return F.expr(SQL_FINITE_VALUE)


# SQL fragments for the DuckDB oracle mirroring dec/dsum/davg exactly.
def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) AS {alias}"


def sql_dsum_raw(expr: str, alias: str) -> str:
    """Sum an expression that is ALREADY decimal-typed (e.g. a product of
    decimals) — no per-row re-rounding, mirrors Spark's scale-widening."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


# decimal disc-price product used by Q1-shaped queries in both dialects
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"
)


def disc_price() -> Column:
    """Column twin of SQL_DISC_PRICE — keep the two in lockstep: a
    precision change mirrored in only one dialect silently splits
    Spark/oracle parity for every revenue query."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec(expr)}) AS DOUBLE) / COUNT(*) AS {alias}"


def chunk_slices(col: str, size: int) -> Column:
    """1-based (seq, payload) slices of a string/binary column as one
    JVM-side higher-order expression — the reference chunker
    (`/root/reference/transf_client.cpp:126-133`) as a narrow map stage.
    The CASE guard matters: ``sequence(1, 0)`` is a DESCENDING sequence in
    Spark, not an empty one, so zero-length input must yield ``array()``
    explicitly. Shared by the text chunker (sources/fixtures.py) and the
    binary chunker (operators/transfer.py) so the guard cannot drift."""
    return F.expr(
        f"""CASE WHEN length({col}) > 0 THEN
              transform(sequence(1, int(ceil(length({col})/{size}.0))),
                        i -> struct(cast(i AS bigint) AS seq,
                                    substring({col}, (i-1)*{size}+1, {size}) AS payload))
            ELSE array() END"""
    )


def basename(col: Column | str) -> Column:
    """Path basename after the last '/' or '\\' — reference ``extract_fn``
    (`/root/reference/transf_client.cpp:27-33`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, r"[/\\]"), -1)
