"""Avro OCF codec gates: (1) property round-trip over the declared subset,
(2) CROSS-IMPLEMENTATION parity against the reference Apache Avro Java
library that ships in Spark's jars — our writer's files must decode under
`org.apache.avro.file.DataFileReader` and vice versa, so the codec is
pinned to the public spec, not to its own bugs — and (3) the decoder fuzz
contract (garbage/mutations → ValueError, never anything else)."""

from __future__ import annotations

import hashlib
import json
import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from transf_spark.sources import avro_ocf as a

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": ["null", "bytes"]},
    ],
}
SYNC = hashlib.md5(b"transf_avro_test").digest()

ROW = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.text(max_size=60)),
    st.floats(allow_nan=False),
    st.booleans(),
    st.one_of(st.none(), st.binary(max_size=40)),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(ROW, max_size=30))
def test_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=7)
    _, it = a.read_ocf(open(p, "rb").read())
    assert list(it) == rows


def test_special_doubles_roundtrip(tmp_path):
    rows = [(1, None, math.nan, True, None), (2, "x", math.inf, False, b"\x00")]
    p = str(tmp_path / "t.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC)
    got = list(a.read_ocf(open(p, "rb").read())[1])
    # NaN != NaN — compare the IEEE bit patterns instead
    pack = lambda r: (r[0], r[1], struct.pack("<d", r[2]), r[3], r[4])
    assert [pack(r) for r in got] == [pack(r) for r in rows]


def test_varint_edges():
    for v in (0, -1, 1, 63, -64, 2**63 - 1, -(2**63)):
        buf = a.encode_long(v)
        back, pos = a.read_long(buf, 0)
        assert (back, pos) == (v, len(buf))


def test_unsupported_schema_rejected():
    import pytest

    for bad in (
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": "enum"}]},
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": ["null", "string", "long"]}]},
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": {"type": "array", "items": "long"}}]},
        {"type": "long"},
    ):
        with pytest.raises(ValueError):
            a.parse_schema(bad)


def test_cross_implementation_parity_with_java_avro(spark, tmp_path):
    """Write with our codec, read with Apache Avro Java (the library in
    Spark's jars) — and the reverse, constructing the Java-side records
    through Avro's own jsonDecoder (py4j auto-unboxes Long to Integer, so
    direct GenericData.Record.put cannot express a long union branch)."""
    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"]},
            {"name": "n_chars", "type": ["null", "long"]},
        ],
    }
    rows = [
        (1, "héllo wörld", 11),
        (2, None, None),
        (-5, "tab\tnl\n", 7),
        (2**62, "x" * 50, 50),
        (3, "", 0),  # empty string stays distinct from NULL
    ]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, schema, rows, SYNC, block_rows=2)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        t = rec.get("text")
        got.append((rec.get("doc_id"), str(t) if t is not None else None, rec.get("n_chars")))
    dfr.close()
    assert got == rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for r in rows:
        payload = json.dumps(
            {
                "doc_id": r[0],
                "text": {"string": r[1]} if r[1] is not None else None,
                "n_chars": {"long": r[2]} if r[2] is not None else None,
            }
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_garbage_never_escapes_valueerror(buf):
    try:
        _, it = a.read_ocf(buf)
        list(it)
    except ValueError:
        pass


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
    st.integers(min_value=0, max_value=10_000),
)
def test_mutations_decode_or_valueerror(tmp_path_factory, pos, mask, cut):
    p = str(tmp_path_factory.mktemp("avro") / "m.avro")
    rows = [(i, f"t{i}", float(i), i % 2 == 0, None) for i in range(20)]
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=6)
    good = open(p, "rb").read()
    mutated = bytearray(good)
    mutated[pos % len(good)] ^= mask
    for buf in (bytes(mutated), good[: cut % (len(good) + 1)]):
        try:
            _, it = a.read_ocf(buf)
            list(it)
        except ValueError:
            continue


def test_block_index_and_range_reads(tmp_path):
    """scan_block_index walks block headers via seek without decoding;
    any partition of the index into ranges must reproduce the file."""
    rows = [(i, f"t{i}" if i % 3 else None, float(i), i % 2 == 0, None) for i in range(100)]
    p = str(tmp_path / "idx.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=7)
    with open(p, "rb") as f:
        idx = a.scan_block_index(f)
    assert len(idx) == 15  # ceil(100/7)
    assert sum(n for _, n, _ in idx) == 100
    for cut in (1, 7, len(idx)):
        got = []
        for i in range(0, len(idx), cut):
            got.extend(a.read_block_range(p, idx[i : i + cut]))
        assert got == rows


def test_reader_splits_one_file_into_many_partitions(monkeypatch, tmp_path):
    """The DataSource reader must split a SINGLE container file into
    multiple input partitions once its payload exceeds the split target —
    the property that parallelizes a multi-GB file at 100 TB (shrunk here
    via the module constant)."""
    from transf_spark.sources import formats

    p = str(tmp_path / "one.avro")
    schema = {
        "type": "record",
        "name": "document",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"]},
            {"name": "text", "type": ["null", "string"]},
            {"name": "lang", "type": ["null", "string"]},
            {"name": "source", "type": ["null", "string"]},
            {"name": "n_chars", "type": ["null", "long"]},
        ],
    }
    rows = [(i, f"text {i}", "en", "s", 10) for i in range(500)]
    a.write_ocf(p, schema, rows, SYNC, block_rows=50)
    monkeypatch.setattr(formats, "AVRO_SPLIT_BYTES", 512)
    reader = formats._AvroDocsReader({"path": str(tmp_path)})
    parts = reader.partitions()
    assert len(parts) > 1, "single file must split under the byte target"
    got = []
    for part in parts:
        got.extend(reader.read(part))
    assert sorted(got) == sorted(rows)


def test_int64_bounds_enforced_both_directions(tmp_path):
    """Round-10 review: 2**63 used to ENCODE as -1 silently, and a hostile
    10-byte varint with high data bits DECODED to ~2^69 instead of
    raising — both directions must ValueError at the int64 boundary, and
    'int' fields at int32 (Java truncates wider, breaking parity)."""
    import pytest

    with pytest.raises(ValueError):
        a.encode_long(2**63)
    with pytest.raises(ValueError):
        a.encode_long(-(2**63) - 1)
    with pytest.raises(ValueError):
        a.read_long(b"\xff" * 9 + b"\x7f", 0)
    int_schema = {"type": "record", "name": "r",
                  "fields": [{"name": "x", "type": "int"}]}
    p = str(tmp_path / "i.avro")
    a.write_ocf(p, int_schema, [(2**30,)], SYNC)  # in range: fine
    with pytest.raises(ValueError):
        a.write_ocf(str(tmp_path / "j.avro"), int_schema, [(2**31,)], SYNC)
