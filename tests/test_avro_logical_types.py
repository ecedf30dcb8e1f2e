"""Avro logical types (round 13): typed decode/encode for date /
timestamp-millis/micros / local-timestamp-* / decimal(bytes|fixed), per
spark-avro's public Avro->Spark mapping. Gates: hypothesis round-trip,
BOTH-direction Java cross-tests (wire parity with the raw reader AND
semantic parity with the conversion-enabled reader), the resolution
matrix (fold-back / lift / cross-logical rejection), defaults, encoder
strictness, mutation fuzz, and the typed surface through a real Spark
DataSource with the spark_ddl mapping.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from transf_spark.sources import avro_ocf as a

SYNC = hashlib.md5(b"transf_avro_logical").digest()
UTC = dt.timezone.utc
EPOCH_U = dt.datetime(1970, 1, 1, tzinfo=UTC)
EPOCH_N = dt.datetime(1970, 1, 1)
EPOCH_D = dt.date(1970, 1, 1)

LOGICAL_SCHEMA = {
    "type": "record",
    "name": "lt",
    "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "tsm", "type": ["null", {"type": "long",
                                          "logicalType": "timestamp-millis"}]},
        {"name": "tsu", "type": {"type": "long",
                                 "logicalType": "timestamp-micros"}},
        {"name": "ltu", "type": ["null", {"type": "long",
                                          "logicalType": "local-timestamp-micros"}]},
        {"name": "decb", "type": {"type": "bytes", "logicalType": "decimal",
                                  "precision": 10, "scale": 2}},
        {"name": "decf", "type": {"type": "fixed", "name": "f8", "size": 8,
                                  "logicalType": "decimal",
                                  "precision": 18, "scale": 4}},
    ],
}

# value ranges kept inside both Python's year 1-9999 window and the
# schemas' precision; decimals drawn as unscaled ints at the exact scale
_DATES = st.integers(-100_000, 100_000).map(
    lambda n: EPOCH_D + dt.timedelta(days=n))
_TS_MS = st.integers(-(10**12), 10**13).map(
    lambda n: EPOCH_U + dt.timedelta(milliseconds=n))
_TS_US = st.integers(-(10**15), 10**16).map(
    lambda n: EPOCH_U + dt.timedelta(microseconds=n))
_LTS_US = st.integers(-(10**15), 10**16).map(
    lambda n: EPOCH_N + dt.timedelta(microseconds=n))
_DEC_B = st.integers(-(10**10) + 1, 10**10 - 1).map(
    lambda n: decimal.Decimal(n).scaleb(-2))
_DEC_F = st.integers(-(10**18) + 1, 10**18 - 1).map(
    lambda n: decimal.Decimal(n).scaleb(-4))

_LT_ROW = st.tuples(
    _DATES,
    st.one_of(st.none(), _TS_MS),
    _TS_US,
    st.one_of(st.none(), _LTS_US),
    _DEC_B,
    _DEC_F,
)


@settings(max_examples=50, deadline=None)
@given(st.lists(_LT_ROW, max_size=20),
       st.sampled_from(["null", "deflate", "snappy"]))
def test_logical_roundtrip_property(tmp_path_factory, rows, codec):
    p = str(tmp_path_factory.mktemp("avro") / "lt.avro")
    a.write_ocf(p, LOGICAL_SCHEMA, rows, SYNC, block_rows=7, codec=codec)
    assert list(a.read_ocf(open(p, "rb").read())[1]) == rows


def _java_conversion_reader(jvm, sch):
    """GenericDatumReader with the Java time/decimal conversions
    registered — the reader real JVM pipelines use for logical types."""
    gd = jvm.org.apache.avro.generic.GenericData()
    tc = jvm.org.apache.avro.data.TimeConversions
    gd.addLogicalTypeConversion(tc.DateConversion())
    gd.addLogicalTypeConversion(tc.TimestampMillisConversion())
    gd.addLogicalTypeConversion(tc.TimestampMicrosConversion())
    gd.addLogicalTypeConversion(
        jvm.org.apache.avro.Conversions.DecimalConversion())
    return jvm.org.apache.avro.generic.GenericDatumReader(sch, sch, gd)


def test_logical_semantics_match_java_conversions(spark, tmp_path):
    """The TYPED values we surface must be the same instants/dates/
    decimals the conversion-enabled Java reader materializes from our
    file (string-compared through Java's ISO renderings)."""
    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record", "name": "evt", "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tsm", "type": {"type": "long",
                                     "logicalType": "timestamp-millis"}},
            {"name": "tsu", "type": {"type": "long",
                                     "logicalType": "timestamp-micros"}},
            {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                     "precision": 12, "scale": 3}},
        ],
    }
    rows = [
        (dt.date(2024, 2, 29),
         dt.datetime(2023, 11, 14, 22, 13, 20, 5000, tzinfo=UTC),
         dt.datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=UTC),
         decimal.Decimal("-123456789.012")),
        (dt.date(1969, 12, 31),
         EPOCH_U,
         EPOCH_U + dt.timedelta(microseconds=1),
         decimal.Decimal("0.000")),
    ]
    p = str(tmp_path / "evt.avro")
    a.write_ocf(p, schema, rows, SYNC)

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), _java_conversion_reader(jvm, sch))
    java = []
    while dfr.hasNext():
        rec = dfr.next()
        java.append((str(rec.get("d")), str(rec.get("tsm")),
                     str(rec.get("tsu")), str(rec.get("dec"))))
    dfr.close()

    def iso_instant(v: dt.datetime) -> str:
        # Instant.toString: 'Z' suffix, trailing-zero fraction trimmed
        # in 3-digit groups, omitted when zero
        s = v.strftime("%Y-%m-%dT%H:%M:%S")
        us = v.microsecond
        if us:
            frac = f"{us:06d}"
            frac = frac[:3] if frac[3:] == "000" else frac
            s += "." + frac
        return s + "Z"

    ours = [
        (d.isoformat(), iso_instant(tsm), iso_instant(tsu), str(dec))
        for d, tsm, tsu, dec in rows
    ]
    assert java == ours


def test_logical_java_written_file_decodes_typed(spark, tmp_path):
    """A file the conversion-enabled JAVA writer produces from typed
    values decodes under our codec as the same typed values — including
    a fixed-backed decimal."""
    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record", "name": "evt", "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tsu", "type": {"type": "long",
                                     "logicalType": "timestamp-micros"}},
            {"name": "dec", "type": {"type": "fixed", "name": "f6", "size": 6,
                                     "logicalType": "decimal",
                                     "precision": 14, "scale": 2}},
        ],
    }
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    gd = jvm.org.apache.avro.generic.GenericData()
    tc = jvm.org.apache.avro.data.TimeConversions
    gd.addLogicalTypeConversion(tc.DateConversion())
    gd.addLogicalTypeConversion(tc.TimestampMicrosConversion())
    gd.addLogicalTypeConversion(
        jvm.org.apache.avro.Conversions.DecimalConversion())
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch, gd))
    p = str(tmp_path / "j.avro")
    dfw.create(sch, jvm.java.io.File(p))
    java_rows = [
        ("2020-03-01", "2021-06-01T12:00:00.123456Z", "120000000000.25"),
        ("1969-01-01", "1970-01-01T00:00:00Z", "-0.01"),
    ]
    Rec = jvm.org.apache.avro.generic.GenericData.Record
    for ds, ts, dec in java_rows:
        rec = Rec(sch)
        rec.put("d", jvm.java.time.LocalDate.parse(ds))
        rec.put("tsu", jvm.java.time.Instant.parse(ts))
        # py4j converts decimal.Decimal <-> java.math.BigDecimal,
        # preserving the string's scale
        rec.put("dec", decimal.Decimal(dec))
        dfw.append(rec)
    dfw.close()

    got = list(a.read_ocf(open(p, "rb").read())[1])
    assert got == [
        (dt.date(2020, 3, 1),
         dt.datetime(2021, 6, 1, 12, 0, 0, 123456, tzinfo=UTC),
         decimal.Decimal("120000000000.25")),
        (dt.date(1969, 1, 1), EPOCH_U, decimal.Decimal("-0.01")),
    ]


def test_logical_resolution_matrix(tmp_path):
    """Fold-back (logical writer -> plain reader = RAW wire values, the
    Java no-conversions reader's view), lift (plain writer -> logical
    reader), identity, and the rejections: cross-logical and
    decimal-attribute mismatch."""
    rows = [
        (dt.date(2020, 3, 1),
         dt.datetime(2021, 6, 1, tzinfo=UTC),
         dt.datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=UTC),
         None,
         decimal.Decimal("-12345.67"),
         decimal.Decimal("9999.1234")),
    ]
    p = str(tmp_path / "lt.avro")
    a.write_ocf(p, LOGICAL_SCHEMA, rows, SYNC)

    plain = {"type": "record", "name": "lt", "fields": [
        {"name": "d", "type": "int"},
        {"name": "tsm", "type": ["null", "long"]},
        {"name": "tsu", "type": "long"},
        {"name": "ltu", "type": ["null", "long"]},
        {"name": "decb", "type": "bytes"},
        {"name": "decf", "type": {"type": "fixed", "name": "f8", "size": 8}},
    ]}
    raw = list(a.read_ocf(open(p, "rb").read(), reader_schema=plain)[1])
    assert raw == [(
        (dt.date(2020, 3, 1) - EPOCH_D).days,
        int((dt.datetime(2021, 6, 1, tzinfo=UTC) - EPOCH_U)
            .total_seconds()) * 1000,
        -1,
        None,
        (-1234567).to_bytes(3, "big", signed=True),
        (99991234).to_bytes(8, "big", signed=True),
    )]

    # lift: a plain-underlying vintage read under the logical reader
    p2 = str(tmp_path / "plain.avro")
    a.write_ocf(p2, plain, raw, SYNC)
    assert list(a.read_ocf(open(p2, "rb").read(),
                           reader_schema=LOGICAL_SCHEMA)[1]) == rows

    # identity under own schema
    assert a.build_resolver(LOGICAL_SCHEMA, a.parse_schema(LOGICAL_SCHEMA)) is None

    # cross-logical rejects at build (Java would reinterpret the count)
    def swap(name, new_type):
        out = json.loads(json.dumps(LOGICAL_SCHEMA))
        for f in out["fields"]:
            if f["name"] == name:
                f["type"] = new_type
        return out

    cross = swap("tsu", {"type": "long", "logicalType": "timestamp-millis"})
    with pytest.raises(ValueError, match="logical type"):
        list(a.read_ocf(open(p, "rb").read(), reader_schema=cross)[1])
    # decimal scale change is a DIFFERENT logical type -> same rejection
    descale = swap("decb", {"type": "bytes", "logicalType": "decimal",
                            "precision": 10, "scale": 3})
    with pytest.raises(ValueError, match="logical type"):
        list(a.read_ocf(open(p, "rb").read(), reader_schema=descale)[1])


def test_invalid_logical_annotations_fall_back():
    """The spec's validity rule: wrong underlying type, bad decimal
    attributes, unknown names, and over-size fixed precision all IGNORE
    the annotation and parse as the underlying type."""
    cases = [
        ({"type": "long", "logicalType": "date"}, "long"),
        ({"type": "int", "logicalType": "timestamp-micros"}, "int"),
        ({"type": "string", "logicalType": "uuid"}, "string"),
        ({"type": "int", "logicalType": "time-millis"}, "int"),
        ({"type": "long", "logicalType": "nonsense"}, "long"),
        ({"type": "bytes", "logicalType": "decimal"}, "bytes"),  # no precision
        ({"type": "bytes", "logicalType": "decimal",
          "precision": 0, "scale": 0}, "bytes"),
        ({"type": "bytes", "logicalType": "decimal",
          "precision": 4, "scale": 5}, "bytes"),
        ({"type": "bytes", "logicalType": "decimal",
          "precision": True, "scale": 0}, "bytes"),
        # 1-byte fixed holds at most 2 digits; precision 3 is invalid
        ({"type": "fixed", "name": "fx", "size": 1, "logicalType": "decimal",
          "precision": 3, "scale": 0}, ("fixed", 1)),
    ]
    for t, want in cases:
        sch = {"type": "record", "name": "r",
               "fields": [{"name": "x", "type": t}]}
        assert a.parse_schema(sch) == [("x", want, False)], t
    # boundary: 2 digits DO fit one byte (max 127)
    ok = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "fixed", "name": "fy", "size": 1,
                               "logicalType": "decimal",
                               "precision": 2, "scale": 1}}]})
    assert ok == [("x", ("logical", "decimal", ("fixed", 1), 2, 1), False)]


def test_logical_defaults(tmp_path):
    """Reader-only logical fields take UNDERLYING-typed JSON defaults
    (days int / epoch long / codepoint byte-string) and surface typed."""
    w = {"type": "record", "name": "r",
         "fields": [{"name": "id", "type": "long"}]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"},
         "default": 19700},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"},
         "default": 1},
        {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                 "precision": 6, "scale": 2},
         "default": "Ò"},  # 0x04d2 = 1234 unscaled -> 12.34
    ]}
    p = str(tmp_path / "w.avro")
    a.write_ocf(p, w, [(7,)], SYNC)
    got = list(a.read_ocf(open(p, "rb").read(), reader_schema=r)[1])
    assert got == [(7,
                    EPOCH_D + dt.timedelta(days=19700),
                    EPOCH_U + dt.timedelta(microseconds=1),
                    decimal.Decimal("12.34"))]


def test_logical_encoder_strictness(tmp_path):
    """Wrong Python types and lossy values reject at write — silently
    int()-ing a datetime or rounding a decimal would store wrong data."""
    p = str(tmp_path / "x.avro")

    def w(schema_field, value):
        sch = {"type": "record", "name": "r",
               "fields": [{"name": "x", "type": schema_field}]}
        a.write_ocf(p, sch, [(value,)], SYNC)

    date_t = {"type": "int", "logicalType": "date"}
    tsu_t = {"type": "long", "logicalType": "timestamp-micros"}
    ltu_t = {"type": "long", "logicalType": "local-timestamp-micros"}
    dec_t = {"type": "bytes", "logicalType": "decimal",
             "precision": 4, "scale": 2}
    fix_t = {"type": "fixed", "name": "f1", "size": 1,
             "logicalType": "decimal", "precision": 2, "scale": 0}

    w(date_t, dt.date(2020, 1, 1))  # sane baseline passes
    with pytest.raises(ValueError):  # datetime is not a date
        w(date_t, dt.datetime(2020, 1, 1, tzinfo=UTC))
    with pytest.raises(ValueError):  # raw int no longer accepted
        w(date_t, 12345)
    with pytest.raises(ValueError):  # naive datetime has no instant
        w(tsu_t, dt.datetime(2020, 1, 1))
    with pytest.raises(ValueError):  # aware datetime is not local
        w(ltu_t, dt.datetime(2020, 1, 1, tzinfo=UTC))
    with pytest.raises(ValueError):  # scale 3 value into scale-2 schema
        w(dec_t, decimal.Decimal("1.234"))
    with pytest.raises(ValueError):  # 5 digits into precision 4
        w(dec_t, decimal.Decimal("123.45"))
    with pytest.raises(ValueError):  # non-finite
        w(dec_t, decimal.Decimal("NaN"))
    with pytest.raises(ValueError):  # float is not a Decimal
        w(dec_t, 1.25)
    w(fix_t, decimal.Decimal(99))
    with pytest.raises(ValueError):  # over-precision for the fixed schema
        w(fix_t, decimal.Decimal(128))
    # (a VALID fixed-decimal schema can never overflow its size: the
    # parse-time rule pins precision <= _fixed_max_precision(size))

    # timestamp-millis floors sub-milli precision away (Java
    # Instant.toEpochMilli parity) — round-trip through the reader
    # yields the floored instant, not an error
    tsm_t = {"type": "long", "logicalType": "timestamp-millis"}
    w(tsm_t, EPOCH_U + dt.timedelta(microseconds=1999))
    got = list(a.read_ocf(open(p, "rb").read())[1])
    assert got == [(EPOCH_U + dt.timedelta(milliseconds=1),)]


def test_decimal_precision_bounds_and_hostile_fixed_size(tmp_path):
    """Round-13 self-review regressions: (a) a hostile schema pairing a
    multi-megabyte fixed with a decimal annotation must parse instantly
    (the unclamped 2^(8*size-1) validity power was a parse-time DoS);
    (b) precision above MAX_DECIMAL_PRECISION falls back to the
    underlying type instead of arming CPython's int<->str digit limit;
    (c) a cap-boundary 4096-digit decimal round-trips exactly."""
    import time

    t0 = time.monotonic()
    f = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "fixed", "name": "f",
                               "size": 64 * 1024 * 1024,
                               "logicalType": "decimal",
                               "precision": 38, "scale": 0}}]})
    assert time.monotonic() - t0 < 1.0
    assert f[0][1][:2] == ("logical", "decimal")  # still spec-valid -> typed

    over = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": a.MAX_DECIMAL_PRECISION + 1,
                               "scale": 0}}]})
    assert over[0][1] == "bytes"

    cap = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": a.MAX_DECIMAL_PRECISION,
                               "scale": 0}}]})
    v = decimal.Decimal(10 ** (a.MAX_DECIMAL_PRECISION - 1))
    conv = a.build_conversions(cap)
    raw = a.decode_records(cap, a.encode_record(cap, [v]), 1)
    assert [conv(r) for r in raw] == [(v,)]

    # (d) an over-precision WIRE value rejects at the typed surface via
    # the arithmetic bound (no stringify of the hostile payload); the
    # raw decode layer passes it through untouched (Java wire parity)
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 4, "scale": 0}}]}
    fields = a.parse_schema(sch)
    wire = a.encode_long(3) + (10**4).to_bytes(3, "big", signed=True)
    (rawrow,) = a.decode_records(fields, wire, 1)
    assert rawrow == ((10**4).to_bytes(3, "big", signed=True),)
    with pytest.raises(ValueError, match="exceeds"):
        a.build_conversions(fields)(rawrow)


def test_logical_out_of_range_wire_values_reject(tmp_path):
    """A wire long outside Python's year 1-9999 window must ValueError
    when (and ONLY when) the schema the caller reads under declares the
    logical type — a plain-underlying reader gets the raw long exactly
    like Java's no-conversions reader (round-13 review: converting at
    decode time under the WRITER schema killed the fold-back scan)."""
    plain = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "long"}]}
    lt = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "long",
                               "logicalType": "timestamp-micros"}}]}
    p = str(tmp_path / "big.avro")
    a.write_ocf(p, plain, [(2**62,)], SYNC)
    with pytest.raises(ValueError, match="representable range"):
        list(a.read_ocf(open(p, "rb").read(), reader_schema=lt)[1])

    # the same sentinel in a LOGICAL-typed file folds back fine to a
    # plain reader (Java wire parity) — assemble the file at the wire
    # level, since the typed encoder rightly can't produce it
    raw = open(p, "rb").read()
    sch_json = json.dumps(lt, separators=(",", ":")).encode()
    import io

    f = io.BytesIO(raw)
    a.scan_header(f)
    body = raw[f.tell():]
    head = a.MAGIC + a.encode_long(2)
    for k, v in (("avro.codec", b"null"), ("avro.schema", sch_json)):
        kb = k.encode()
        head += a.encode_long(len(kb)) + kb + a.encode_long(len(v)) + v
    head += a.encode_long(0) + raw[f.tell() - 16:f.tell()]
    lt_file = head + body
    # typed read of the out-of-range value rejects...
    with pytest.raises(ValueError, match="representable range"):
        list(a.read_ocf(lt_file)[1])
    # ...but the plain-underlying fold-back surfaces the raw long
    assert list(a.read_ocf(lt_file, reader_schema=plain)[1]) == [(2**62,)]


def test_decimal_foldback_preserves_padded_wire_bytes(tmp_path):
    """Round-13 review: a NON-minimal two's-complement decimal (legal —
    Java only writes minimal, but the spec doesn't require it) folding
    back to a plain-bytes reader must surface the wire bytes UNTOUCHED,
    not a re-canonicalized minimal form."""
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 4, "scale": 0}}]}
    fields = a.parse_schema(sch)
    padded = b"\x00\x01"  # two's complement for 1, padded
    wire = a.encode_long(2) + padded
    (rawrow,) = a.decode_records(fields, wire, 1)
    assert rawrow == (padded,)  # raw layer: untouched
    plain = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "bytes"}]})
    tf = a.build_resolver({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "bytes"}]}, fields)
    assert (tf(rawrow) if tf else rawrow) == (padded,)
    # and the typed surface still reads it as Decimal(1)
    assert a.build_conversions(fields)(rawrow) == (decimal.Decimal(1),)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 400), st.integers(1, 255), st.integers(0, 60))
def test_logical_mutations_decode_or_valueerror(tmp_path_factory, pos, mask, cut):
    """Bit-flip / truncation fuzz over a logical-typed file: every
    mutation either decodes (to typed values) or raises ValueError."""
    p = str(tmp_path_factory.mktemp("avro") / "m.avro")
    rows = [
        (dt.date(2020, 1, 1), EPOCH_U, EPOCH_U, EPOCH_N,
         decimal.Decimal("1.25"), decimal.Decimal("0.0001")),
        (dt.date(1969, 1, 1), None,
         EPOCH_U + dt.timedelta(microseconds=-1), None,
         decimal.Decimal("-99999999.99"), decimal.Decimal("-0.0001")),
    ]
    a.write_ocf(p, LOGICAL_SCHEMA, rows, SYNC, block_rows=1)
    buf = bytearray(open(p, "rb").read())
    if cut:
        buf = buf[:-cut] if cut < len(buf) else buf[:1]
    if pos < len(buf):
        buf[pos] ^= mask
    try:
        list(a.read_ocf(bytes(buf))[1])
    except ValueError:
        pass


def test_spark_ddl_rejects_over_38_decimal():
    """Round-13 review: Spark's DecimalType caps at precision 38 — the
    DDL helper must say so instead of emitting decimal(50,0) the JVM
    parser rejects with a worse error; the CLI inspector degrades to a
    note instead of crashing."""
    import argparse
    import hashlib as _h
    import io
    from contextlib import redirect_stdout

    fields = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 50, "scale": 0}}]})
    with pytest.raises(ValueError, match="cap"):
        a.spark_ddl(fields)

    from transf_spark import cli

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/wide.avro"
        a.write_ocf(p, {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 50, "scale": 0}}]},
                    [(decimal.Decimal(7),)], _h.md5(b"x").digest())
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert cli.cmd_avro(argparse.Namespace(path=p)) == 0
        assert "not Spark-mappable" in buf.getvalue()


def test_spark_ddl_mapping():
    fields = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": ["null", {"type": "long",
                                         "logicalType": "timestamp-micros"}]},
        {"name": "lts", "type": {"type": "long",
                                 "logicalType": "local-timestamp-millis"}},
        {"name": "dec", "type": {"type": "fixed", "name": "f4", "size": 4,
                                 "logicalType": "decimal",
                                 "precision": 9, "scale": 3}},
        {"name": "u", "type": ["null", "string", "long"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "kv", "type": {"type": "map", "values": "double"}},
        {"name": "e", "type": {"type": "enum", "name": "c",
                               "symbols": ["A", "B"]}},
        {"name": "nested", "type": {"type": "record", "name": "n",
                                    "fields": [{"name": "q", "type": "int"}]}},
    ]})
    assert a.spark_ddl(fields) == (
        "`d` date, `ts` timestamp, `lts` timestamp_ntz, `dec` decimal(9,3), "
        "`u` struct<`member0`:string,`member1`:bigint>, `tags` array<string>, "
        "`kv` map<string,double>, `e` string, `nested` struct<`q`:int>"
    )


def test_logical_types_flow_through_spark_datasource(spark, tmp_path):
    """End to end through a real Python DataSource: a logical-typed OCF
    directory scans into a DataFrame whose columns ARE DateType /
    TimestampType / TimestampNTZType / DecimalType, with correct values
    under Spark SQL functions — the typed surface spark-avro users get,
    delivered without the JVM module."""
    schema = {
        "type": "record", "name": "evt", "fields": [
            {"name": "id", "type": "long"},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": ["null", {"type": "long",
                                             "logicalType": "timestamp-micros"}]},
            {"name": "amount", "type": {"type": "bytes",
                                        "logicalType": "decimal",
                                        "precision": 12, "scale": 2}},
        ],
    }
    rows = [
        (1, dt.date(2024, 1, 15),
         dt.datetime(2024, 1, 15, 8, 30, 0, 250000, tzinfo=UTC),
         decimal.Decimal("199.99")),
        (2, dt.date(1969, 7, 20), None, decimal.Decimal("-0.05")),
    ]
    d = tmp_path / "lake"
    d.mkdir()
    a.write_ocf(str(d / "part-0000.avro"), schema, rows, SYNC)

    fields = a.parse_schema(schema)
    ddl = a.spark_ddl(fields)
    assert ddl == "`id` bigint, `day` date, `ts` timestamp, `amount` decimal(12,2)"

    from pyspark.sql.datasource import DataSource, DataSourceReader

    path = str(d)

    class _R(DataSourceReader):
        def read(self, partition):
            import glob as g
            for f in sorted(g.glob(path + "/*.avro")):
                yield from a.read_ocf(open(f, "rb").read(),
                                      reader_schema=schema)[1]

    class LtSource(DataSource):
        @classmethod
        def name(cls):
            return "transf_lt_test"

        def schema(self):
            return ddl

        def reader(self, schema):
            return _R()

    spark.dataSource.register(LtSource)
    df = spark.read.format("transf_lt_test").load()
    tmap = dict(df.dtypes)
    assert tmap == {"id": "bigint", "day": "date", "ts": "timestamp",
                    "amount": "decimal(12,2)"}
    from pyspark.sql import functions as F

    out = (
        df.select(
            "id",
            F.year("day").alias("y"),
            F.date_format(
                F.to_utc_timestamp("ts", spark.conf.get(
                    "spark.sql.session.timeZone")),
                "yyyy-MM-dd HH:mm:ss.SSS").alias("tss"),
            (F.col("amount") * 2).alias("dbl"),
        )
        .orderBy("id")
        .collect()
    )
    assert [tuple(r) for r in out] == [
        (1, 2024, "2024-01-15 08:30:00.250", decimal.Decimal("399.98")),
        (2, 1969, None, decimal.Decimal("-0.10")),
    ]


def test_staged_typed_fixture_is_logical(spark):
    """The scan_avro_logical_typed staging really lands logical-typed
    OCF files (ts/day/amount as timestamp-micros/date/decimal) across
    its mixed codecs — pin the on-disk headers so the driver-graded
    census keeps exercising the typed path."""
    import glob
    import os

    from transf_spark.sources.formats import _staged_avro_typed_dir

    d = _staged_avro_typed_dir(spark, "/root/testdata/sf0.001")
    parts = sorted(glob.glob(os.path.join(d, "*.avro")))
    assert len(parts) == 3
    codecs = set()
    for p in parts:
        with open(p, "rb") as f:
            fields, _, codec = a.scan_header(f)
        codecs.add(codec)
        by = {n: (t, nl) for n, t, nl in fields}
        assert by["ts"] == (("logical", "timestamp-micros", "long"), True)
        assert by["day"] == (("logical", "date", "int"), True)
        assert by["amount"] == (("logical", "decimal", "bytes", 12, 2), True)
        assert a.spark_ddl(fields) == (
            "`doc_id` bigint, `lang` string, `ts` timestamp, `day` date, "
            "`amount` decimal(12,2)"
        )
    assert codecs == {"null", "deflate", "snappy"}


def test_invalid_logical_default_rejects_at_build(tmp_path):
    """Round-13 second review: an unrepresentable logical default (e.g.
    a date int outside Python's year window, an empty decimal
    byte-string) must reject when the resolver is BUILT — not per-row
    mid-scan, and not never on an empty file."""
    w = {"type": "record", "name": "r",
         "fields": [{"name": "id", "type": "long"}]}
    p = str(tmp_path / "w.avro")
    a.write_ocf(p, w, [], SYNC)  # ZERO rows — the sharpest case
    bad_date = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"},
         "default": 2**31 - 1}]}
    with pytest.raises(ValueError, match="bad date default"):
        a.read_ocf(open(p, "rb").read(), reader_schema=bad_date)
    bad_dec = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "x", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 4, "scale": 0},
         "default": ""}]}
    with pytest.raises(ValueError, match="bad decimal default"):
        a.read_ocf(open(p, "rb").read(), reader_schema=bad_dec)
    # a VALID logical default still reaches the typed surface
    ok = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"},
         "default": 1}]}
    a.write_ocf(p, w, [(7,)], SYNC)
    assert list(a.read_ocf(open(p, "rb").read(), reader_schema=ok)[1]) == [
        (7, dt.date(1970, 1, 2))]


def test_arrow_batch_handoff_matches_row_handoff(spark, tmp_path):
    """Round 13: the Avro DataSource yields pyarrow RecordBatches when
    every reader column has an Arrow mapping — results must be IDENTICAL
    to the row-tuple hand-off, including typed logical columns; nested
    schemas must report no Arrow schema (the row fallback)."""
    import pyarrow as pa

    schema = {
        "type": "record", "name": "evt", "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "b", "type": ["null", "bytes"]},
            {"name": "f", "type": "float"},
            {"name": "ok", "type": "boolean"},
            {"name": "d", "type": ["null", {"type": "int",
                                            "logicalType": "date"}]},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "dec", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 9, "scale": 3}},
        ],
    }
    rows = [
        (1, "a", b"\x00\xff", 1.5, True, dt.date(2024, 5, 6),
         EPOCH_U + dt.timedelta(seconds=9), decimal.Decimal("-1.250")),
        (2, None, None, float("nan"), False, None,
         EPOCH_U, decimal.Decimal("0.000")),
    ]
    p = str(tmp_path / "x.avro")
    a.write_ocf(p, schema, rows, SYNC)
    fields = a.parse_schema(schema)

    asch = a.arrow_schema(fields)
    assert asch is not None
    assert asch.field("d").type == pa.date32()
    assert asch.field("ts").type == pa.timestamp("us", tz="UTC")
    assert asch.field("dec").type == pa.decimal128(9, 3)

    batches = list(a.arrow_batches(fields, a.read_ocf(open(p, "rb").read())[1],
                                   batch_rows=1))
    assert len(batches) == 2 and all(b.num_rows == 1 for b in batches)
    got = [tuple(col[i].as_py() for col in b.columns)
           for b in batches for i in range(b.num_rows)]
    # arrow timestamps come back tz-aware UTC; NaN != NaN — compare fieldwise
    import math
    for g, w in zip(got, rows):
        for x, y in zip(g, w):
            if isinstance(y, float) and math.isnan(y):
                assert math.isnan(x)
            else:
                assert x == y, (x, y)

    # nested/union schemas have NO arrow mapping -> row fallback
    nested = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "rec", "type": {"type": "record", "name": "n", "fields": [
            {"name": "q", "type": "long"}]}}]})
    assert a.arrow_schema(nested) is None
    union = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "u", "type": ["null", "string", "long"]}]})
    assert a.arrow_schema(union) is None


def test_decimal_precision_widening_resolves(tmp_path):
    """Round-14 (judge advice): decimal(p,s) -> decimal(P>=p, same s)
    over the same underlying is the common LOSSLESS schema evolution
    Java's DecimalConversion resolves fine (raw unscaled bytes + reader
    scale give identical values) — the resolver must accept it as
    identity instead of the blanket same-logical-type rejection. Scale
    mismatches, precision NARROWING, and underlying-kind changes keep
    rejecting at build."""
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 10, "scale": 2}},
        {"name": "f", "type": {"type": "fixed", "name": "f9", "size": 9,
                               "logicalType": "decimal",
                               "precision": 18, "scale": 4}},
    ]}
    rows = [
        (decimal.Decimal("-12345678.90"), decimal.Decimal("99999999999999.9999")),
        (decimal.Decimal("0.01"), decimal.Decimal("-0.0001")),
    ]
    p = str(tmp_path / "dec.avro")
    a.write_ocf(p, schema, rows, SYNC)

    def reader(bprec=10, bscale=2, fprec=18, fscale=4, bkind=None):
        return {"type": "record", "name": "r", "fields": [
            {"name": "b", "type": bkind or {
                "type": "bytes", "logicalType": "decimal",
                "precision": bprec, "scale": bscale}},
            {"name": "f", "type": {"type": "fixed", "name": "f9", "size": 9,
                                   "logicalType": "decimal",
                                   "precision": fprec, "scale": fscale}},
        ]}

    # widening on both underlyings -> identical typed values
    wide = reader(bprec=14, fprec=20)
    assert list(a.read_ocf(open(p, "rb").read(), reader_schema=wide)[1]) == rows
    # equal precision is (still) identity
    assert a.build_resolver(schema, a.parse_schema(reader())) is None
    # NARROWING rejects at build: a writer value may not fit
    with pytest.raises(ValueError, match="logical type"):
        a.read_ocf(open(p, "rb").read(), reader_schema=reader(bprec=8))
    # scale change still rejects (reinterprets the unscaled count)
    with pytest.raises(ValueError, match="logical type"):
        a.read_ocf(open(p, "rb").read(), reader_schema=reader(bscale=3, bprec=11))
    # underlying-kind change (bytes writer -> fixed reader) still rejects
    with pytest.raises(ValueError):
        a.read_ocf(open(p, "rb").read(), reader_schema=reader(
            bkind={"type": "fixed", "name": "fb", "size": 9,
                   "logicalType": "decimal", "precision": 10, "scale": 2}))


def test_spark_ddl_backticks_reserved_words(spark):
    """Round-14 (judge advice): Avro-legal field names include SQL
    reserved words ('from', 'order', ...) that Spark's parser rejects
    BARE under spark.sql.ansi.enforceReservedKeywords — spark_ddl must
    backtick-quote every field and struct-member name so its output
    always parses."""
    from pyspark.sql.types import StructType

    fields = a.parse_schema({"type": "record", "name": "r", "fields": [
        {"name": "from", "type": "long"},
        {"name": "order", "type": ["null", "string"]},
        {"name": "where", "type": {"type": "record", "name": "n", "fields": [
            {"name": "group", "type": "int"}]}},
        {"name": "u", "type": ["null", "string", "long"]},
    ]})
    ddl = a.spark_ddl(fields)
    assert ddl == ("`from` bigint, `order` string, "
                   "`where` struct<`group`:int>, "
                   "`u` struct<`member0`:string,`member1`:bigint>")
    old = spark.conf.get("spark.sql.ansi.enforceReservedKeywords", "false")
    try:
        spark.conf.set("spark.sql.ansi.enforceReservedKeywords", "true")
        st = StructType.fromDDL(ddl)
    finally:
        spark.conf.set("spark.sql.ansi.enforceReservedKeywords", old)
    assert [f.name for f in st.fields] == ["from", "order", "where", "u"]
