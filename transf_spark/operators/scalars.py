"""Scalar-function suites (SURVEY.md §2 R20-R25 equivalents + hash/UDF).

The reference's scalar library (`/root/reference/src/utils.tpp`,
`/root/reference/src/network.cpp:885-920`, `/root/reference/transf_client.cpp:27-39`)
re-expressed as JVM-side Column expressions; the single place Python UDFs are
allowed is ``udf_suite`` — demonstrating the Arrow-vectorized slow path on
semantics built-ins can't express (the reference's exact integer-math size
formatter).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from transf_spark.functions.exprs import basename, props_k_gate, sql_props_k_gate
from transf_spark.queries import register
from transf_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# String suite (R21 join_ip_port, R22 fmt, R25 extract_fn/trim)
# --------------------------------------------------------------------------


@register(
    "scalar_string_suite",
    oracle="""
    SELECT doc_id,
           trim(' ' || lang || ' ') AS lang_trim,
           upper(source) AS src_upper,
           length(text) AS text_len,
           string_split_regex(source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt', '[/\\\\]')[-1] AS fn_base,
           source || ':' || CAST(doc_id % 65536 AS VARCHAR) AS addr,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           printf('[%s]:%d', source, doc_id % 65536) AS addr_v6,
           regexp_replace(source, '[0-9]+$', '') AS src_stem,
           substring(text, 1, 16) AS head16
    FROM documents
    """,
    category="scalar/string",
    origin="R21,R22,R25",
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim / split+basename (`extract_fn`, /root/reference/transf_client.cpp:27-39),
    concat_ws `ip:port` + bracketed v6 formatting (`join_ip_port`,
    /root/reference/src/network.cpp:907-920), lpad / printf / regexp_replace /
    substring — all whole-stage-codegen'd JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    port = (F.col("doc_id") % 65536).cast("long")
    fn = F.concat(F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt"))
    return docs.select(
        "doc_id",
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.upper("source").alias("src_upper"),
        F.length("text").alias("text_len"),
        basename(fn).alias("fn_base"),
        # concat, not concat_ws: concat_ws SKIPS null fields where the
        # oracle's || propagates them — a null source must null the addr
        # on both engines (review finding; current fixtures have none)
        F.concat(F.col("source"), F.lit(":"), port.cast("string")).alias("addr"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        # format_string renders a null arg as the literal 'null' (Java
        # Formatter) where DuckDB printf returns NULL — gate it explicitly
        F.when(
            F.col("source").isNotNull() & port.isNotNull(),
            F.format_string("[%s]:%d", F.col("source"), port),
        ).alias("addr_v6"),
        F.regexp_replace("source", "[0-9]+$", "").alias("src_stem"),
        F.substring("text", 1, 16).alias("head16"),
    )


# --------------------------------------------------------------------------
# Network validators (R20 check_ip/check_port/get_ipversion)
# --------------------------------------------------------------------------

_IPV4_RE = r"((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"


@register(
    "scalar_net_validators",
    oracle=f"""
    SELECT doc_id,
           CAST(doc_id % 300 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS ip,
           CAST(doc_id % 70000 AS BIGINT) AS port,
           regexp_full_match(CAST(doc_id % 300 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1',
                             '{_IPV4_RE}') AS ip_ok,
           doc_id % 70000 BETWEEN 1 AND 65535 AS port_ok,
           CASE WHEN regexp_full_match(CAST(doc_id % 300 AS VARCHAR) || '.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1',
                                       '{_IPV4_RE}') THEN 'IPv4' ELSE 'invalid' END AS ip_version
    FROM documents
    """,
    category="scalar/net",
    origin="R20",
)
def scalar_net_validators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`check_ip` / `check_port` / `get_ipversion`
    (`/root/reference/src/network.cpp:885-905`) as pure expressions: a full
    dotted-quad regex (octets derived from doc_id so ~15% are deliberately
    out of range), the (0, 65536) port interval, and the version classifier.
    """
    docs = load_table(spark, sf_dir, "documents")
    ip = F.concat_ws(
        ".",
        (F.col("doc_id") % 300).cast("string"),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("0"),
        F.lit("1"),
    )
    port = (F.col("doc_id") % 70000).cast("long")
    ip_ok = ip.rlike(f"^{_IPV4_RE}$")
    return docs.select(
        "doc_id",
        ip.alias("ip"),
        port.alias("port"),
        ip_ok.alias("ip_ok"),
        port.between(1, 65535).alias("port_ok"),
        F.when(ip_ok, "IPv4").otherwise("invalid").alias("ip_version"),
    )


# --------------------------------------------------------------------------
# Date / math suite (R15 RTT math, R24 Timer)
# --------------------------------------------------------------------------


@register(
    "scalar_date_math_suite",
    oracle="""
    SELECT event_id,
           date_trunc('day', ts) AS day_ts,
           date_trunc('hour', ts) AS hour_ts,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(dayofmonth(ts) AS INT) AS dom,
           date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS days_since,
           epoch_ms(CAST(floor(epoch_ms(ts) / 1000) AS BIGINT) * 1000) AS ts_sec,
           round(value, 1) AS val_round,
           CASE WHEN value BETWEEN -9.0e18 AND 9.0e18
                THEN CAST(floor(value) AS BIGINT) END AS val_floor,
           CASE WHEN value > -1.0 THEN round(ln(value + 1), 6) END AS val_ln,
           value * value AS val_sq,
           pow(2, CAST(event_id % 10 AS INT)) AS pow2,
           ((CAST(event_id AS BIGINT) - 7) % 5 + 5) % 5 AS pmod5
    FROM events
    """,
    category="scalar/datetime-math",
    origin="R15,R24",
)
def scalar_date_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timer/RTT arithmetic generalized (`/root/reference/src/utils.tpp:67-94`):
    truncation, calendar extraction, day deltas, epoch-ms round-trip
    (``timestamp()``'s ms resolution), rounding/log/pow/pmod."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day_ts"),
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_ts"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("dom"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.timestamp_millis(
            (F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / 1000) * 1000).cast("long")
        )
        .cast("timestamp_ntz")
        .alias("ts_sec"),
        F.round("value", 1).alias("val_round"),
        # int64-representability guard mirrored in BOTH dialects (round-14
        # degenerate-events device): floor(NaN/±Inf/overflow) casts to
        # BIGINT as 0/LONG_MAX under Spark's ANSI-off cast but HARD-ERRORS
        # DuckDB; NaN fails the BETWEEN in both engines
        F.when(
            F.col("value").between(-9.0e18, 9.0e18),
            F.floor("value").cast("long"),
        ).alias("val_floor"),
        # round(…,6): JVM Math.log and C log can differ in the last ulp.
        # log-domain guard mirrored: Spark's log NULLs on value+1 <= 0
        # where DuckDB's ln raises — the explicit predicate keeps both
        # engines on the same rows (NaN passes > -1 in both and yields NaN)
        F.when(
            F.col("value") > -1.0, F.round(F.log(F.col("value") + 1), 6)
        ).alias("val_ln"),
        # x*x, not pow(x,2): IEEE-exact on both engines; pow exercised on
        # exact powers of two where every libm agrees
        (F.col("value") * F.col("value")).alias("val_sq"),
        F.pow(F.lit(2), (F.col("event_id") % 10).cast("int")).alias("pow2"),
        F.pmod(F.col("event_id") - 7, F.lit(5)).cast("long").alias("pmod5"),
    )


# --------------------------------------------------------------------------
# Array / JSON suite
# --------------------------------------------------------------------------


@register(
    "scalar_array_map_json_suite",
    oracle=f"""
    SELECT event_id,
           {sql_props_k_gate("INT")} AS prop_k,
           {sql_props_k_gate("INT")} % 7 AS prop_k_mod,
           CAST(to_json([event_id % 5, user_id % 5, CAST(length(event_type) AS BIGINT)]) AS VARCHAR) AS triple,
           list_contains([event_id % 5, user_id % 5], 3) AS has_three,
           len(string_split(coalesce(event_type, ''), 'i')) - 1 AS n_i,
           CAST(user_id AS BIGINT) AS map_user
    FROM events
    """,
    category="scalar/array-json",
    origin="EXT",
)
def scalar_array_map_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over ``events.props`` (get_json_object + from_json),
    array construction/membership, split-count; map_from_entries exercised
    then collapsed to a scalar (map values don't hash portably across
    engines). The constructed array is emitted as ``to_json`` text — raw
    array columns break the driver's canonicalizer (unhashable ndarray), and
    both engines render int-array JSON identically (``[1,2,3]``). Both
    extractions ride the shared canonical-props gate (exprs.PROPS_CANON_RE):
    outside it the two JSON parsers genuinely diverge — DuckDB RAISES on
    leading-zero integers, and fractional text splits three ways (Spark
    get_json_object truncates, from_json NULLs, DuckDB rounds) — so
    non-canonical bags are NULL in both dialects by the same test (the
    round-9 events-sweep finding)."""
    ev = load_table(spark, sf_dir, "events")
    k = props_k_gate(F.get_json_object("props", "$.k").cast("int"))
    k2 = props_k_gate(F.from_json("props", "k INT").getField("k"))
    m = F.map_from_entries(F.expr("array(struct('u', user_id))"))
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        (k2 % 7).alias("prop_k_mod"),
        F.to_json(
            F.array(
                F.col("event_id") % 5,
                F.col("user_id") % 5,
                F.length("event_type").cast("long"),
            )
        ).alias("triple"),
        # coalesce: Spark's array_contains is THREE-valued (NULL when the
        # probe is absent but the array holds a NULL) while DuckDB's
        # list_contains is two-valued FALSE (round-6 events sweep)
        F.coalesce(
            F.array_contains(F.array(F.col("event_id") % 5, F.col("user_id") % 5), 3),
            F.lit(False),
        ).alias("has_three"),
        # coalesce BOTH dialects: size(split(NULL)) = -1 (so n_i = -2)
        # where the oracle's len(NULL) is NULL (round-6 events sweep)
        (F.size(F.split(F.coalesce(F.col("event_type"), F.lit("")), "i")) - 1)
        .cast("long")
        .alias("n_i"),
        m.getItem("u").alias("map_user"),
    )


# --------------------------------------------------------------------------
# Hash / integrity (strengthens R8's size-only integrity check)
# --------------------------------------------------------------------------


@register(
    "hash_integrity_suite",
    oracle="""
    SELECT doc_id,
           sha256(text) AS text_sha256,
           md5(text) AS text_md5,
           length(text) AS text_len
    FROM documents
    """,
    category="hash/integrity",
    origin="R8+",
)
def hash_integrity_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content integrity — the checksum the reference's
    honor-system size check lacks (`/root/reference/transf_server.cpp:277-283`;
    README's 'security check' is filename+clamp only)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2("text", 256).alias("text_sha256"),
        F.md5("text").alias("text_md5"),
        F.length("text").alias("text_len"),
    )


@register(
    "hash_noncrypto",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(text) AS BIGINT) AS n_hashed,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_text,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_xxh64,
           TRUE AS small_hash_collisions_bounded
    FROM documents
    """,
    category="hash/integrity",
    origin="R8+",
)
def hash_noncrypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-crypto-hash invariant census — the hash-checkable declared form
    (the ``similarity_ann_lsh`` / ``text_language_id`` device): xxhash64 /
    crc32 / murmur3 values are Spark-specific (no DuckDB twin exists), but
    their key-quality CONTRACTS are exactly statable:

    - coverage: every NON-NULL text hashes non-NULL (``n_hashed`` =
      ``COUNT(text)`` — NULL inputs are excluded on both sides because
      xxhash64/murmur3 of NULL return the seed, not NULL);
    - injectivity at 64 bits: distinct xxhash64 count EQUALS distinct
      input count — a birthday collision among even 10⁶ texts has
      probability ~1e-7, so the equality is regeneration-safe; a broken
      hash (constant, truncated, NULL-folding) collapses it instantly;
    - 32-bit honesty: crc32/murmur3 CAN collide at corpus scale
      (birthday ≈ 0.3% at 5k docs), so they get a bounded-loss flag
      (≤ 2 collisions each) rather than a brittle exact equality.

    The per-doc hash surface — the actual partitioning/sampling keys —
    stays as :func:`hash_noncrypto_values` (repeat-determinism and
    collision census gated in tests/test_round6_edges.py). Plan: one map
    pass + one global aggregate; the distinct counts are the only
    shuffle."""
    h = hash_noncrypto_values(spark, sf_dir)
    # Every hash column is gated on text IS NOT NULL before the distinct
    # count: xxhash64/murmur3 of a NULL input return the SEED (42), not
    # NULL, so an unguarded count_distinct would count one extra "hash of
    # nothing" value the oracle's COUNT(DISTINCT text) can't see (round-6
    # review finding, reproduced on a synthetic NULL-text fixture).
    nn = F.col("text").isNotNull()

    def _nn_distinct(col: str):
        return F.count_distinct(F.when(nn, F.col(col)))

    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (
                nn
                & F.col("text_xxh64").isNotNull()
                & F.col("text_crc32").isNotNull()
                & F.col("text_murmur3").isNotNull()
            ).cast("long")
        ).alias("n_hashed"),
        F.count_distinct("text").alias("n_distinct_text"),
        _nn_distinct("text_xxh64").alias("n_distinct_xxh64"),
        (
            ((F.count_distinct("text") - _nn_distinct("text_crc32")) <= 2)
            & ((F.count_distinct("text") - _nn_distinct("text_murmur3")) <= 2)
        ).alias("small_hash_collisions_bounded"),
    )


def hash_noncrypto_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-cryptographic hashes for partitioning/sampling/dedup keys at
    100 TB — xxhash64 (Spark's shuffle-grade hash), crc32, murmur3."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "text",
        F.xxhash64("text").alias("text_xxh64"),
        F.crc32(F.col("text").cast("binary")).alias("text_crc32"),
        F.hash("text").alias("text_murmur3"),
    )


# --------------------------------------------------------------------------
# Bitwise / byte-order suite (R3-R4 frame header packing)
# --------------------------------------------------------------------------

# htonl of a u32 (`/root/reference/transf_client.cpp:111,163`): byte-reverse
# via shifts+masks — one expression string shared verbatim by both dialects so
# the arithmetic is literally identical.
_BSWAP32 = (
    "(((({v}) & 255) << 24) | (((({v}) >> 8) & 255) << 16)"
    " | (((({v}) >> 16) & 255) << 8) | ((({v}) >> 24) & 255))"
)


@register(
    "scalar_bitwise_suite",
    oracle=f"""
    SELECT doc_id,
           ((doc_id << 32) | (n_chars & 4294967295)) AS packed_header,
           (((doc_id << 32) | (n_chars & 4294967295)) >> 32) AS seq_back,
           (((doc_id << 32) | (n_chars & 4294967295)) & 4294967295) AS len_back,
           {_BSWAP32.format(v="doc_id")} AS seq_be,
           CAST(bit_count(CAST(doc_id AS BIGINT)) AS INT) AS seq_bits,
           xor(doc_id, n_chars) AS hdr_xor
    FROM documents
    """,
    category="scalar/bitwise",
    origin="R3,R4",
)
def scalar_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-header packing as bit arithmetic: the reference builds its wire
    frames by memcpy-ing a network-byte-order u32 seq next to the tag
    (`/root/reference/transf_client.cpp:111-114,163-167`, unpacked with
    ``ntohl`` at `:180-188`). Re-expressed relationally: pack (seq, len) into
    one 64-bit word, unpack it back, byte-swap the seq (htonl), popcount and
    xor — all JVM-side codegen'd expressions, the kind of integer kernel a
    columnar engine chews through at memory bandwidth."""
    docs = load_table(spark, sf_dir, "documents")
    packed = "((doc_id << 32) | (n_chars & 4294967295))"
    return docs.select(
        "doc_id",
        F.expr(packed).alias("packed_header"),
        F.expr(f"({packed} >> 32)").alias("seq_back"),
        F.expr(f"({packed} & 4294967295)").alias("len_back"),
        # identical expression text to the oracle's — both dialects parse
        # C-style shift/mask operators, so the arithmetic is literally shared
        F.expr(_BSWAP32.format(v="doc_id")).alias("seq_be"),
        F.bit_count("doc_id").alias("seq_bits"),
        F.expr("doc_id ^ n_chars").alias("hdr_xor"),
    )


# --------------------------------------------------------------------------
# UDF suite (the sanctioned slow path)
# --------------------------------------------------------------------------


@pandas_udf(T.StringType())
def fmt_size_udf(size: pd.Series) -> pd.Series:
    """Reference ``fmt_size`` exact integer semantics
    (`/root/reference/src/utils.tpp:18-33`): repeated /1024 with the
    2-digit truncated fraction of the *last* division step, fraction
    formatted as '0d' when <10, 'd' when a multiple of 10.

    Arrow-vectorized (one Python call per batch) — and only used here;
    every other scalar in the engine is a JVM expression.
    """

    def one(v) -> str:
        units = ["B", "KB", "MB", "GB", "TB"]
        s = int(v)
        i = 0
        p = 0
        while s >= 1024 and i < 4:
            p = s % 1024 * 100 // 1024 % 100
            s //= 1024
            i += 1
        if p < 10:
            p_str = "0" + str(p)
        elif p % 10 == 0:
            p_str = str(p // 10)
        else:
            p_str = str(p)
        num = str(s) + ("" if p == 0 else "." + p_str)
        return num + " " + units[i]

    # na_action="ignore": a NULL size reaches the batch as NaN (nullable
    # int64 → float64) and int(NaN) raises — NULL passes through as NULL,
    # matching the oracle's NULL-propagating CASE (round-6 universe sweep)
    return size.map(one, na_action="ignore")


@register(
    "udf_suite",
    oracle="""
    SELECT o_orderkey,
           sz AS size_bytes,
           CASE
             WHEN sz < 1024 THEN CAST(sz AS VARCHAR) || ' B'
             ELSE CAST(sz // 1024 AS VARCHAR) ||
               CASE WHEN p = 0 THEN ''
                    WHEN p < 10 THEN '.0' || CAST(p AS VARCHAR)
                    WHEN p % 10 = 0 THEN '.' || CAST(p // 10 AS VARCHAR)
                    ELSE '.' || CAST(p AS VARCHAR) END || ' KB'
           END AS size_h
    FROM (
      SELECT o_orderkey,
             CAST(floor(o_totalprice) AS BIGINT) AS sz,
             CAST(floor(o_totalprice) AS BIGINT) % 1024 * 100 // 1024 % 100 AS p
      FROM orders
    )
    """,
    category="udf",
    origin="R22",
)
def udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF scalar demo: the reference's byte-size formatter applied to
    order totals (all < 1 MiB ⇒ oracle only needs the B/KB branches —
    asserted in tests; the full udf is unit-tested against all units)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("size_bytes"),
        fmt_size_udf(F.floor("o_totalprice").cast("long")).alias("size_h"),
    )


@register(
    "scalar_variant_shred",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)) AS BIGINT)
             AS sum_year,
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS n_null_price,
           TRUE AS paths_consistent
    FROM orders
    GROUP BY o_orderstatus
    """,
    category="scalar/semi-structured",
    origin="EXT",
)
def scalar_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT shredding — the open-ended semi-structured type the
    `events_props_json_extract` path can't demonstrate on its single-key
    props bag (the SURVEY §7 M9 deferral, resolved with the module
    family's synthesis device instead of a new fixture): each order is
    rendered to a nested JSON document JVM-side (`to_json` over a struct
    with a nested object and an array), parsed to VARIANT (`parse_json`),
    and shredded back through typed paths — `variant_get('$.price',
    'double')`, nested `'$.meta.year'`, array index `'$.keys[1]'`, and a
    group key read FROM the variant (`'$.status'`).

    The oracle computes the same census from the RAW columns — a genuine
    cross-derivation: equality proves to_json ∘ parse_json ∘ variant_get
    is a lossless typed round-trip, including NULL semantics (to_json
    OMITS null fields, variant_get returns NULL for missing paths — so
    a NULL price/date/status survives the round trip as NULL; Spark's
    shortest-repr double rendering re-parses to the identical double).
    paths_consistent folds a per-row null-safe check that the id
    extracted from '$.id' AND the array element '$.keys[1]' both equal
    the order key carried OUTSIDE the variant.

    Scale: synthesis, parse, and extraction are all map-side expressions
    fused into the scan stage; the census is ONE map-side-combinable
    aggregate over the ≤|statuses| domain. At 100 TB the to_json select
    is replaced by the real semi-structured ingest (JSONL/Kafka) and the
    VARIANT column is stored shredded in parquet — same extraction
    expressions, same plan shape."""
    orders = load_table(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("price"),
            F.struct(
                F.year("o_orderdate").alias("year"),
                F.col("o_orderpriority").alias("prio"),
            ).alias("meta"),
            F.array(F.col("o_custkey"), F.col("o_orderkey")).alias("keys"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    v = orders.select("o_orderkey", doc.alias("doc")).select(
        "o_orderkey", F.expr("parse_json(doc)").alias("v")
    )
    shred = v.select(
        F.expr("variant_get(v, '$.status', 'string')").alias("status"),
        F.expr("variant_get(v, '$.price', 'double')").alias("price"),
        F.expr("variant_get(v, '$.meta.year', 'long')").alias("yr"),
        # null-safe: a NULL order key must compare TRUE against the NULL
        # the variant round-trips (to_json omits the field)
        F.expr(
            "variant_get(v, '$.id', 'long') <=> o_orderkey"
            " AND variant_get(v, '$.keys[1]', 'long') <=> o_orderkey"
        ).alias("row_ok"),
    )
    return shred.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("price").cast("decimal(12,2)")).cast("double").alias("sum_price"),
        F.sum("yr").alias("sum_year"),
        F.sum(F.when(F.col("price").isNull(), 1).otherwise(0)).alias("n_null_price"),
        F.coalesce(F.min(F.col("row_ok").cast("int")) == 1, F.lit(True)).alias(
            "paths_consistent"
        ),
    )
