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

import pytest

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


def _drain_reader(reader, parts):
    """Collect a DataSource reader's output as row tuples — the reader
    yields pyarrow RecordBatches on the Arrow fast path (round 13) and
    plain tuples on the nested-schema fallback."""
    out = []
    for part in parts:
        for item in reader.read(part):
            if hasattr(item, "num_rows"):  # pyarrow.RecordBatch
                out.extend(
                    tuple(col[i].as_py() for col in item.columns)
                    for i in range(item.num_rows)
                )
            else:
                out.append(item)
    return out

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
        # multi-branch unions are SUPPORTED since round 12; what stays
        # rejected is the spec-invalid rest: union-in-union, duplicate
        # branch types, a union of only null, an empty union
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": ["long", ["null", "string"]]}]},
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": ["null", ["string", "long"]]}]},
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": ["string", "string"]}]},
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": ["int", "long", "int"]}]},
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": ["null"]}]},
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": []}]},
        # container-of-container is SUPPORTED since round 12 (to
        # MAX_SCHEMA_DEPTH); malformed container items stay rejected
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "array", "items": {"type": "array", "items": "enum"}}}]},
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "map", "values": {"type": "map"}}}]},
        # nested records / enum / fixed are SUPPORTED since round 11 —
        # but malformed ones stay rejected: empty record fields, empty or
        # duplicate enum symbols, negative fixed size
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "record", "name": "inner", "fields": []}}]},
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "enum", "name": "e", "symbols": []}}]},
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "enum", "name": "e", "symbols": ["A", "A"]}}]},
        {"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "fixed", "name": "f", "size": -1}}]},
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
    got = _drain_reader(reader, parts)
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


# ---- round-11 additions: deflate codec + block-walker adversarial splits ----


@settings(max_examples=40, deadline=None)
@given(st.lists(ROW, max_size=30))
def test_deflate_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "d.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=7, codec="deflate")
    _, it = a.read_ocf(open(p, "rb").read())
    assert list(it) == rows


def test_deflate_block_ranges_decode_independently(tmp_path):
    """Deflate blocks must stay independently decodable — the property
    block-granular splits depend on (each executor decompresses only its
    own block range, never a cross-block stream)."""
    rows = [(i, f"txt{i}" if i % 3 else None, float(i), i % 2 == 0, None) for i in range(100)]
    p = str(tmp_path / "d.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=7, codec="deflate")
    with open(p, "rb") as f:
        idx = a.scan_block_index(f)
    assert len(idx) == 15
    got = []
    for i in range(0, len(idx), 4):  # disjoint ranges, out of lockstep with block_rows
        got.extend(a.read_block_range(p, idx[i : i + 4]))
    assert got == rows


def test_deflate_cross_implementation_parity_with_java_avro(spark, tmp_path):
    """Same both-directions contract as the null-codec test, under the
    spec's other REQUIRED codec: our deflate files must decode under the
    Apache Avro Java DataFileReader in Spark's jars, and files written by
    Java's CodecFactory.deflateCodec must decode under ours."""
    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"]},
        ],
    }
    rows = [(i, (f"héllo wörld {i}" * 3) if i % 4 else None) for i in range(50)]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, schema, rows, SYNC, block_rows=8, codec="deflate")
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        t = rec.get("text")
        got.append((rec.get("doc_id"), str(t) if t is not None else None))
    dfr.close()
    assert got == rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for r in rows:
        payload = json.dumps(
            {"doc_id": r[0], "text": {"string": r[1]} if r[1] is not None else None}
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
    st.integers(min_value=0, max_value=10_000),
)
def test_deflate_mutations_decode_or_valueerror(tmp_path_factory, pos, mask, cut):
    p = str(tmp_path_factory.mktemp("avro") / "md.avro")
    rows = [(i, f"t{i}" * 5, float(i), i % 2 == 0, None) for i in range(40)]
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=6, codec="deflate")
    good = open(p, "rb").read()
    mutated = bytearray(good)
    mutated[pos % len(good)] ^= mask
    for buf in (bytes(mutated), good[: cut % (len(good) + 1)]):
        try:
            _, it = a.read_ocf(buf)
            list(it)
        except ValueError:
            continue


def _block_header_offsets(data: bytes) -> list[int]:
    """Byte offsets of each block's COUNT varint — the scan_block_index
    seam the round-10 verdict asked to fuzz specifically."""
    import io

    f = io.BytesIO(data)
    a.scan_header(f)
    starts = []
    end = len(data)
    while f.tell() < end:
        starts.append(f.tell())
        a._read_stream_long(f)  # count
        size = a._read_stream_long(f)
        f.seek(f.tell() + size + 16)
    return starts


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=1, max_value=255),
    st.sampled_from(["count", "size", "sync"]),
)
def test_block_walker_seam_mutations(tmp_path_factory, pick, mask, where):
    """Adversarial mutations AT the block-header/sync seams (not uniform
    over the file): flip bytes in a block's count varint, size varint, or
    trailing sync marker — scan_block_index must raise ValueError or
    produce an index whose ranges still decode (never crash, never
    mis-decode silently past a corrupt boundary)."""
    p = str(tmp_path_factory.mktemp("avro") / "seam.avro")
    rows = [(i, f"t{i}", float(i), i % 2 == 0, None) for i in range(60)]
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=9)
    data = open(p, "rb").read()
    starts = _block_header_offsets(data)
    blk = starts[pick % len(starts)]
    mutated = bytearray(data)
    if where == "count":
        mutated[blk] ^= mask
    elif where == "size":
        mutated[blk + 1] ^= mask  # first byte after the (short) count varint
    else:  # sync marker after this block's payload
        import io

        f = io.BytesIO(data)
        f.seek(blk)
        a._read_stream_long(f)
        size = a._read_stream_long(f)
        mutated[f.tell() + size] ^= mask
    try:
        _, it = a.read_ocf(bytes(mutated))
        list(it)
    except ValueError:
        pass


def test_zero_record_block_accepted(tmp_path):
    """A zero-record block is legal OCF (another writer may flush empty;
    the Java reader accepts it) — the walker must skip it without
    emitting a split, and the file must still decode (round-10 advice)."""
    rows = [(i, f"t{i}", float(i), True, None) for i in range(10)]
    p = str(tmp_path / "z.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=5)
    data = open(p, "rb").read()
    starts = _block_header_offsets(data)
    # splice an empty block (count=0, size=0, sync) between the two blocks
    empty = a.encode_long(0) + a.encode_long(0) + SYNC
    spliced = data[: starts[1]] + empty + data[starts[1] :]
    import io

    idx = a.scan_block_index(io.BytesIO(spliced))
    assert [n for _, n, _ in idx] == [5, 5]  # empty block skipped
    assert list(a.read_ocf(spliced)[1]) == rows


def test_bytes_field_rejects_non_bytes(tmp_path):
    """bytes(7) would silently encode seven ZERO bytes — the codec must
    reject a non-bytes-like value in a 'bytes' field (round-10 advice)."""
    import pytest

    with pytest.raises(ValueError, match="bytes-like"):
        a.write_ocf(str(tmp_path / "b.avro"), SCHEMA, [(1, "x", 0.0, True, 7)], SYNC)


def test_int32_bound_enforced_on_decode():
    """A malformed file carrying an out-of-int32 varint in an 'int' field
    must ValueError on decode, symmetric with the encode guard
    (round-10 advice)."""
    import pytest

    fields = [("x", "int", False)]
    with pytest.raises(ValueError, match="int32"):
        a.decode_records(fields, a.encode_long(2**31), 1)
    with pytest.raises(ValueError, match="int32"):
        a.decode_records(fields, a.encode_long(-(2**31) - 1), 1)
    assert a.decode_records(fields, a.encode_long(2**31 - 1), 1) == [(2**31 - 1,)]


def test_truncated_metadata_key_raises():
    """Header cut mid-key must raise the diagnosable truncated-key error,
    not decode a silently shortened key (round-10 advice)."""
    import pytest

    hdr = a.MAGIC + a.encode_long(1) + a.encode_long(20) + b"short"
    import io

    with pytest.raises(ValueError, match="truncated metadata key"):
        a.scan_header(io.BytesIO(hdr))


def test_split_packing_exact_boundary(monkeypatch, tmp_path):
    """Multi-block file whose LAST block lands group_bytes EXACTLY on
    AVRO_SPLIT_BYTES: the >= flush must emit that full split and no empty
    trailing split (round-10 verdict item 5 — pins the packing boundary)."""
    from transf_spark.sources import formats

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
    # fixed-width rows -> every 1-record block has identical payload size
    rows = [(1000 + i, f"{i:06d}", "en", "s", 6) for i in range(20)]
    p = str(tmp_path / "one.avro")
    a.write_ocf(p, schema, rows, SYNC, block_rows=1)
    with open(p, "rb") as f:
        idx = a.scan_block_index(f)
    sizes = {s for _, _, s in idx}
    assert len(sizes) == 1, "fixture rows must encode to identical block sizes"
    s = sizes.pop()
    monkeypatch.setattr(formats, "AVRO_SPLIT_BYTES", 5 * s)  # 20 blocks -> 4 exact splits
    reader = formats._AvroDocsReader({"path": str(tmp_path)})
    parts = reader.partitions()
    assert len(parts) == 4
    assert all(len(part.value[1]) == 5 for part in parts), "every split exactly 5 blocks"
    assert _drain_reader(reader, parts) == rows


# ---- round-11 additions: float / array / map subset extension ---------------

RICH_SCHEMA = {
    "type": "record",
    "name": "rich",
    "fields": [
        {"name": "vec_id", "type": "long"},
        {"name": "score_f", "type": "float"},
        {"name": "embedding", "type": {"type": "array", "items": "float"}},
        {"name": "tags", "type": ["null", {"type": "array", "items": ["null", "string"]}]},
        {"name": "attrs", "type": {"type": "map", "values": ["null", "long"]}},
    ],
}

_F32 = st.floats(allow_nan=False, width=32)
RICH_ROW = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    _F32,
    st.lists(_F32, max_size=12),
    st.one_of(st.none(), st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=6)),
    st.dictionaries(st.text(max_size=8), st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)), max_size=6),
)


@settings(max_examples=50, deadline=None)
@given(st.lists(RICH_ROW, max_size=20))
def test_rich_types_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "r.avro")
    a.write_ocf(p, RICH_SCHEMA, rows, SYNC, block_rows=5, codec="deflate")
    got = list(a.read_ocf(open(p, "rb").read())[1])
    assert got == rows


def test_rich_types_cross_implementation_with_java(spark, tmp_path):
    """float/array/map written by our codec must decode under the Apache
    Avro Java reader, and the reverse — values chosen exactly
    representable in float32 so the JSON detour cannot blur them."""
    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record",
        "name": "rich",
        "fields": [
            {"name": "vec_id", "type": "long"},
            {"name": "score_f", "type": "float"},
            {"name": "embedding", "type": {"type": "array", "items": "float"}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
        ],
    }
    rows = [
        (1, 0.5, [1.25, -2.5, 0.0], {"a": 7, "b": -3}),
        (2, -128.0, [], {}),
        (3, 3.5, [0.0078125] * 5, {"k": 2**60}),
    ]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, schema, rows, SYNC, block_rows=2)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        emb = [float(x) for x in rec.get("embedding")]
        attrs = {str(k): e for k, e in ((str(k), rec.get("attrs").get(k)) for k in rec.get("attrs").keySet())}
        got.append((rec.get("vec_id"), float(rec.get("score_f")), emb, attrs))
    dfr.close()
    assert got == [(r[0], r[1], r[2], r[3]) for r in rows]

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for r in rows:
        payload = json.dumps(
            {"vec_id": r[0], "score_f": r[1], "embedding": r[2], "attrs": r[3]}
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


def test_multiblock_array_decodes():
    """The spec allows an array value split across MULTIPLE blocks, with
    negative counts carrying a byte-size prefix — our writer emits one
    block, but the reader must accept the full form (a Java writer with a
    small buffer produces it)."""
    fields = [("xs", ("array", "long", False), False)]
    # [1,2] in two blocks, the second with negative-count + byte-size form
    body = (
        a.encode_long(1) + a.encode_long(1)          # block: 1 item -> 1
        + a.encode_long(-1) + a.encode_long(1) + a.encode_long(2)  # -1 block, size 1, item 2
        + a.encode_long(0)                            # terminator
    )
    assert a.decode_records(fields, body, 1) == [([1, 2],)]


def test_container_fuzz_never_escapes_valueerror(tmp_path):
    """Mutation fuzz over a rich-typed file: ValueError or clean decode,
    mirroring the flat-record contract."""
    rows = [
        (i, float(i), [float(j) for j in range(i % 4)], None if i % 3 else ["t", None], {"k": i})
        for i in range(15)
    ]
    p = str(tmp_path / "rf.avro")
    a.write_ocf(p, RICH_SCHEMA, rows, SYNC, block_rows=4)
    good = open(p, "rb").read()
    for pos in range(0, len(good), 7):
        for mask in (0x01, 0x80, 0xFF):
            mutated = bytearray(good)
            mutated[pos] ^= mask
            try:
                _, it = a.read_ocf(bytes(mutated))
                list(it)
            except ValueError:
                continue


# ---- round-11 self-review regressions ---------------------------------------


def test_zero_count_block_with_payload_rejected(tmp_path):
    """A count varint corrupted to 0x00 on a REAL block must raise, not
    silently skip the block's rows (round-11 review): only genuinely
    empty zero-record blocks are walked past."""
    import io

    import pytest

    rows = [(i, f"t{i}", float(i), True, None) for i in range(10)]
    p = str(tmp_path / "zc.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=5)
    data = open(p, "rb").read()
    starts = _block_header_offsets(data)
    # block_rows=5 encodes count as the single varint byte 0x0A; zero it
    assert data[starts[0]] == a.encode_long(5)[0]
    mutated = bytearray(data)
    mutated[starts[0]] = 0x00
    with pytest.raises(ValueError, match="zero-record block carries"):
        a.scan_block_index(io.BytesIO(bytes(mutated)))
    with pytest.raises(ValueError):
        list(a.read_ocf(bytes(mutated))[1])


def test_deflate_bomb_rejected(tmp_path):
    """A small compressed block expanding past MAX_BLOCK_BYTES must raise
    ValueError before the allocation, not OOM the executor
    (round-11 review; deflate reaches ~1032:1)."""
    import io
    import zlib

    import pytest

    # hand-assemble an OCF whose single block claims 1 record but inflates
    # to MAX_BLOCK_BYTES + some: ~130 KB compressed zeros -> 132 MiB
    bomb = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = bomb.compress(b"\x00" * (a.MAX_BLOCK_BYTES + (1 << 22))) + bomb.flush()
    assert len(payload) < 1 << 20, "bomb must be small on disk"
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"deflate",
    }
    buf = bytearray(a.MAGIC)
    buf += a.encode_long(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        buf += a.encode_long(len(kb)) + kb + a.encode_long(len(v)) + v
    buf += a.encode_long(0)
    buf += SYNC
    buf += a.encode_long(1) + a.encode_long(len(payload)) + payload + SYNC
    with pytest.raises(ValueError, match="decompressed bytes"):
        list(a.read_ocf(bytes(buf))[1])


def test_float_overflow_raises_valueerror(tmp_path):
    """A finite double outside float32 range must raise the codec's
    contract ValueError, not struct's OverflowError (round-11 review);
    inf and nan pack fine and round-trip."""
    import math

    import pytest

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "float"}]}
    with pytest.raises(ValueError, match="float32"):
        a.write_ocf(str(tmp_path / "f.avro"), schema, [(1e39,)], SYNC)
    p = str(tmp_path / "g.avro")
    a.write_ocf(p, schema, [(math.inf,), (-math.inf,), (math.nan,)], SYNC)
    got = list(a.read_ocf(open(p, "rb").read())[1])
    assert got[0] == (math.inf,) and got[1] == (-math.inf,)
    assert math.isnan(got[2][0])


def test_map_key_edge_cases():
    """Mixed-type map keys must not TypeError out of the sort, and
    distinct keys that stringify equal must raise instead of silently
    collapsing in the reader's dict (round-11 review)."""
    import pytest

    prim = ("map", "long", False)
    # mixed types, unique after stringify: fine (keys become strings)
    enc = a._encode_value(prim, {1: 10, "b": 20})
    got, pos = a._read_value(prim, enc, 0)
    assert pos == len(enc) and got == {"1": 10, "b": 20}
    # distinct keys, equal after stringify: reject
    with pytest.raises(ValueError, match="duplicate map key"):
        a._encode_value(prim, {1: 10, "1": 20})


def test_like_for_like_membership_pinned():
    """bench.py enforces the frozen subset at import (round-11 review) —
    this test just keeps the enforcement itself from being deleted."""
    import hashlib

    import bench

    assert len(bench.LIKE_FOR_LIKE) == 106
    assert (
        hashlib.md5(",".join(bench.LIKE_FOR_LIKE).encode()).hexdigest()
        == "75088ccb81710ea75eb8e50a547848f4"
    )


# ---------------------------------------------------------------------------
# Nested records (round 11): recursive record fields + array/map of records.
# Same three gates as every other subset extension — property round-trip,
# cross-implementation parity with the Java library in both directions, and
# the mutation contract (decode or ValueError, never anything else).
# ---------------------------------------------------------------------------

NESTED_SCHEMA = {
    "type": "record",
    "name": "top",
    "fields": [
        {"name": "id", "type": "long"},
        {
            "name": "meta",
            "type": {
                "type": "record",
                "name": "meta",
                "fields": [
                    {"name": "k", "type": "string"},
                    {
                        "name": "inner",
                        "type": [
                            "null",
                            {
                                "type": "record",
                                "name": "inner",
                                "fields": [{"name": "x", "type": "double"}],
                            },
                        ],
                    },
                ],
            },
        },
        {
            "name": "spans",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "span",
                    "fields": [
                        {"name": "lo", "type": "int"},
                        {"name": "hi", "type": "int"},
                    ],
                },
            },
        },
        {
            "name": "opt",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "opt_rec",
                    "fields": [{"name": "b", "type": "boolean"}],
                },
            ],
        },
    ],
}

_I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
NESTED_ROW = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.tuples(
        st.text(max_size=20),
        st.one_of(st.none(), st.tuples(st.floats(allow_nan=False))),
    ),
    st.lists(st.tuples(_I32, _I32), max_size=8),
    st.one_of(st.none(), st.tuples(st.booleans())),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(NESTED_ROW, max_size=20))
def test_nested_record_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "n.avro")
    a.write_ocf(p, NESTED_SCHEMA, rows, SYNC, block_rows=5, codec="deflate")
    assert list(a.read_ocf(open(p, "rb").read())[1]) == rows


def test_nested_record_accepts_dicts_and_rejects_bad_shapes(tmp_path):
    # by-name dict values are accepted (Spark Row.asDict interop), and a
    # wrong-arity tuple raises instead of silently mis-encoding
    import pytest

    p = str(tmp_path / "n.avro")
    rows = [(1, {"k": "a", "inner": {"x": 2.0}}, [(0, 1)], {"b": True})]
    a.write_ocf(p, NESTED_SCHEMA, rows, SYNC)
    assert list(a.read_ocf(open(p, "rb").read())[1]) == [
        (1, ("a", (2.0,)), [(0, 1)], (True,))
    ]
    with pytest.raises(ValueError):
        a.write_ocf(p, NESTED_SCHEMA, [(1, ("a",), [], None)], SYNC)
    with pytest.raises(ValueError):
        a.write_ocf(p, NESTED_SCHEMA, [(1, 7, [], None)], SYNC)


def test_nested_schema_limits_rejected():
    import pytest

    # named-type REFERENCES are SUPPORTED since round 12; what stays
    # rejected is true RECURSION (a self-referential record cannot expand
    # to a finite descriptor) and duplicate definitions
    rec = {
        "type": "record",
        "name": "node",
        "fields": [{"name": "next", "type": ["null", "node"]}],
    }
    with pytest.raises(ValueError, match="recursive"):
        a.parse_schema(rec)
    dup = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": {"type": "record", "name": "n",
                                   "fields": [{"name": "x", "type": "long"}]}},
            {"name": "b", "type": {"type": "enum", "name": "n",
                                   "symbols": ["A"]}},
        ],
    }
    with pytest.raises(ValueError, match="duplicate type name"):
        a.parse_schema(dup)
    # recursion bomb: a hostile header must ValueError, not RecursionError
    deep = "long"
    for i in range(2 * a.MAX_SCHEMA_DEPTH + 2):
        deep = {"type": "record", "name": f"r{i}",
                "fields": [{"name": "x", "type": deep}]}
    with pytest.raises(ValueError):
        a.parse_schema(deep)
    # empty nested fields list stays rejected
    with pytest.raises(ValueError):
        a.parse_schema({"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": "record", "name": "e", "fields": []}}]})


def test_nested_record_cross_implementation_with_java(spark, tmp_path):
    """Nested records written by our codec must decode under the Apache
    Avro Java reader, and files the Java writer produces (via its own
    jsonDecoder — union branches keyed by the record NAME) must decode
    under ours."""
    jvm = spark.sparkContext._jvm
    rows = [
        (1, ("a", (2.5,)), [(0, 4), (5, 9)], (True,)),
        (2, ("b", None), [], None),
        (-(2**40), ("", (0.0,)), [(-1, 1)], (False,)),
    ]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, NESTED_SCHEMA, rows, SYNC, block_rows=2)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        meta = rec.get("meta")
        inner = meta.get("inner")
        spans = [(s.get("lo"), s.get("hi")) for s in rec.get("spans")]
        opt = rec.get("opt")
        got.append(
            (
                rec.get("id"),
                (str(meta.get("k")),
                 (float(inner.get("x")),) if inner is not None else None),
                spans,
                (bool(opt.get("b")),) if opt is not None else None,
            )
        )
    dfr.close()
    assert got == rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(NESTED_SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for r in rows:
        payload = json.dumps(
            {
                "id": r[0],
                "meta": {
                    "k": r[1][0],
                    "inner": {"inner": {"x": r[1][1][0]}} if r[1][1] is not None else None,
                },
                "spans": [{"lo": lo, "hi": hi} for lo, hi in r[2]],
                "opt": {"opt_rec": {"b": r[3][0]}} if r[3] is not None else None,
            }
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
)
def test_nested_mutations_decode_or_valueerror(tmp_path_factory, pos, mask):
    p = str(tmp_path_factory.mktemp("avro") / "nm.avro")
    rows = [
        (i, (f"k{i}", (float(i),) if i % 3 else None), [(i, i + 1)] * (i % 4),
         (i % 2 == 0,) if i % 5 else None)
        for i in range(15)
    ]
    a.write_ocf(p, NESTED_SCHEMA, rows, SYNC, block_rows=4)
    good = open(p, "rb").read()
    mutated = bytearray(good)
    mutated[pos % len(good)] ^= mask
    try:
        _, it = a.read_ocf(bytes(mutated))
        list(it)
    except ValueError:
        pass


def test_real_embeddings_table_roundtrips_array_float(spark, tmp_path):
    """The sf0.001 embeddings table (vec_id long, embedding array<float>,
    label string) round-trips through the codec on REAL fixture data —
    the shape the float/array extension exists for. float32 values are
    exactly representable in the parquet source (written as float), so
    equality is exact."""
    rows = [
        (r.vec_id, [float(x) for x in r.embedding], int(r.label))
        for r in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(200)
        .collect()
    ]
    schema = {
        "type": "record",
        "name": "emb",
        "fields": [
            {"name": "vec_id", "type": "long"},
            {"name": "embedding", "type": {"type": "array", "items": "float"}},
            {"name": "label", "type": ["null", "long"]},
        ],
    }
    p = str(tmp_path / "emb.avro")
    a.write_ocf(p, schema, rows, SYNC, block_rows=64, codec="deflate")
    assert list(a.read_ocf(open(p, "rb").read())[1]) == rows


def test_nested_records_flow_through_spark_datasource(spark, tmp_path):
    """Nested tuples decoded by the codec must land as Spark STRUCT rows
    through the Python DataSource API — the executor-side plumbing the
    nested-record extension feeds (struct schema declared source-side,
    tuple rows yielded by read_block_range)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    rows = [
        (1, ("a", (2.5,)), [(0, 4), (5, 9)], (True,)),
        (2, ("b", None), [], None),
        (3, ("c", (1.0,)), [(1, 2)], (False,)),
    ]
    path = str(tmp_path / "nested.avro")
    a.write_ocf(path, NESTED_SCHEMA, rows, SYNC, block_rows=2, codec="deflate")

    class NestedAvroTestSource(DataSource):
        @classmethod
        def name(cls):
            return "transf_nested_avro_test"

        def schema(self):
            return (
                "id long, "
                "meta struct<k: string, inner: struct<x: double>>, "
                "spans array<struct<lo: int, hi: int>>, "
                "opt struct<b: boolean>"
            )

        def reader(self, schema):
            opts = self.options

            class _R(DataSourceReader):
                def partitions(self):
                    from transf_spark.sources.avro_ocf import scan_block_index

                    with open(opts["path"], "rb") as f:
                        index = scan_block_index(f)
                    return [InputPartition((opts["path"], tuple(index)))]

                def read(self, partition):
                    from transf_spark.sources.avro_ocf import read_block_range

                    p, blocks = partition.value
                    yield from read_block_range(p, list(blocks))

            return _R()

    spark.dataSource.register(NestedAvroTestSource)
    df = (
        spark.read.format("transf_nested_avro_test")
        .option("path", path)
        .load()
        .orderBy("id")
    )
    got = [
        (
            r.id,
            (r.meta.k, (r.meta.inner.x,) if r.meta.inner is not None else None),
            [(s.lo, s.hi) for s in r.spans],
            (r.opt.b,) if r.opt is not None else None,
        )
        for r in df.collect()
    ]
    assert got == rows


def test_dict_wrapped_primitive_schemas_accepted():
    """The spec's JSON-object schema form — {"type": primitive,
    ...annotations} — must parse: SUPPORTED logical annotations (round
    13) map to typed descriptors, unknown/irrelevant annotations fall
    back to the underlying primitive; a dict wrapping another dict
    stays rejected."""
    import pytest

    sch = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "s", "type": {"type": "string", "avro.java.string": "String"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "d", "type": ["null", {"type": "int", "logicalType": "date"}]},
            {"name": "xs", "type": {"type": "array",
                                    "items": {"type": "float", "doc": "score"}}},
        ],
    }
    assert a.parse_schema(sch) == [
        ("s", "string", False),
        ("ts", ("logical", "timestamp-micros", "long"), False),
        ("d", ("logical", "date", "int"), True),
        ("xs", ("array", "float", False), False),
    ]
    with pytest.raises(ValueError):
        a.parse_schema({"type": "record", "name": "r", "fields": [
            {"name": "x", "type": {"type": {"type": "string"}}}]})


def test_logical_type_annotations_cross_implementation(spark, tmp_path):
    """Wire parity for logicalType-annotated schemas (round 13: the
    annotations decode TYPED): our writer's typed values must read back
    under the Java GenericDatumReader (no conversions registered) as
    exactly the raw underlying primitives, and a file the JAVA writer
    produces from raw underlying values must decode under our codec as
    the typed twins — the logical layer is pure local conversion over an
    identical wire."""
    import datetime as dt

    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record",
        "name": "evt",
        "fields": [
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "day", "type": ["null", {"type": "int", "logicalType": "date"}]},
            {"name": "who", "type": {"type": "string", "avro.java.string": "String"}},
        ],
    }
    raw_rows = [(1_700_000_000_000_000, 19_700, "ana"), (0, None, ""), (-1, 0, "bo")]
    epoch_u = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    epoch_d = dt.date(1970, 1, 1)
    typed_rows = [
        (epoch_u + dt.timedelta(microseconds=ts),
         None if day is None else epoch_d + dt.timedelta(days=day),
         who)
        for ts, day, who in raw_rows
    ]

    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, schema, typed_rows, SYNC, block_rows=2)
    assert list(a.read_ocf(open(p1, "rb").read())[1]) == typed_rows
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        day = rec.get("day")
        got.append((rec.get("ts"), day, str(rec.get("who"))))
    dfr.close()
    assert got == raw_rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for ts, day, who in raw_rows:
        payload = json.dumps(
            {"ts": ts, "day": {"int": day} if day is not None else None, "who": who}
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == typed_rows


# ---------------------------------------------------------------------------
# Schema resolution (round 11): reader schema vs writer schema per the
# spec's resolution rules — match by name, drop writer-only fields, default
# reader-only fields, promote (int->long/float/double, long->float/double,
# float->double, string<->bytes). Gates: the full matrix, the error ladder,
# parity with the Java GenericDatumReader's OWN resolution, and a
# mixed-vintage directory scan through the DataSource API.
# ---------------------------------------------------------------------------

W_EVOLVE = {
    "type": "record",
    "name": "d",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "score", "type": "long"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "old", "type": "string"},
    ],
}
R_EVOLVE = {
    "type": "record",
    "name": "d",
    "fields": [
        {"name": "score", "type": "double"},
        {"name": "id", "type": ["null", "long"]},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "added", "type": ["null", "string"], "default": None},
        {"name": "n", "type": "long", "default": 7},
        # spec: bytes defaults are strings of codepoints 0-255
        {"name": "blob", "type": "bytes", "default": "\u0001\u00ff"},
    ],
}


def test_schema_resolution_matrix(tmp_path):
    """Reorder + drop + default + promote in one resolution; bytes
    defaults use the spec's codepoint-0-255 string encoding."""
    rows = [(1, 10, "a", "x"), (2, -5, None, "y")]
    p = str(tmp_path / "e.avro")
    a.write_ocf(p, W_EVOLVE, rows, SYNC, block_rows=1, codec="deflate")
    fields, it = a.read_ocf(open(p, "rb").read(), reader_schema=R_EVOLVE)
    assert [n for n, _, _ in fields] == ["score", "id", "tag", "added", "n", "blob"]
    assert list(it) == [
        (10.0, 1, "a", None, 7, b"\x01\xff"),
        (-5.0, 2, None, None, 7, b"\x01\xff"),
    ]
    # identity resolution is the no-op fast path
    assert a.build_resolver(W_EVOLVE, a.parse_schema(W_EVOLVE)) is None


def test_schema_resolution_error_ladder():
    import pytest

    wf = a.parse_schema(W_EVOLVE)
    for bad_reader, why in (
        ({"type": "record", "name": "d", "fields": [
            {"name": "id", "type": "boolean"}]}, "no promotion"),
        ({"type": "record", "name": "d", "fields": [
            {"name": "score", "type": "int"}]}, "demotion"),
        ({"type": "record", "name": "d", "fields": [
            {"name": "tag", "type": "string"}]}, "nullable into non-nullable"),
        ({"type": "record", "name": "d", "fields": [
            {"name": "nope", "type": "long"}]}, "missing without default"),
        ({"type": "record", "name": "d", "fields": [
            {"name": "n", "type": "long", "default": "x"}]}, "non-integer default"),
        ({"type": "record", "name": "d", "fields": [
            {"name": "b", "type": "bytes", "default": "\u0100"}]}, "codepoint > 255"),
    ):
        with pytest.raises(ValueError):
            a.build_resolver(bad_reader, wf)
    # duplicate field names rejected at parse (resolution matches by name)
    with pytest.raises(ValueError):
        a.parse_schema({"type": "record", "name": "d", "fields": [
            {"name": "x", "type": "long"}, {"name": "x", "type": "long"}]})


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.integers(min_value=-(2**53), max_value=2**53),  # exact in double
    st.one_of(st.none(), st.text(max_size=20)),
    st.text(max_size=10),
), max_size=25))
def test_schema_resolution_property(tmp_path_factory, rows):
    """Resolved read == the plain read post-transformed in Python."""
    p = str(tmp_path_factory.mktemp("avro") / "e.avro")
    a.write_ocf(p, W_EVOLVE, rows, SYNC, block_rows=6)
    got = list(a.read_ocf(open(p, "rb").read(), reader_schema=R_EVOLVE)[1])
    expect = [
        (float(score), id_, tag, None, 7, b"\x01\xff")
        for id_, score, tag, _old in rows
    ]
    assert got == expect


def test_schema_resolution_matches_java_reader(spark, tmp_path):
    """Our resolution must agree with the Java GenericDatumReader given
    the SAME writer/reader schemas — the semantics are pinned to the
    reference implementation, not to our own reading of the spec."""
    jvm = spark.sparkContext._jvm
    rows = [(1, 10, "a", "x"), (2, -5, None, "y"), (-(2**31), 2**53, "", "z")]
    p = str(tmp_path / "e.avro")
    a.write_ocf(p, W_EVOLVE, rows, SYNC, block_rows=2)

    rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(R_EVOLVE))
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    rdr.setExpected(rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), rdr)
    java_rows = []
    while dfr.hasNext():
        rec = dfr.next()
        blob = rec.get("blob")
        barr = bytearray()
        bb = blob.duplicate()
        while bb.hasRemaining():
            barr.append(bb.get() & 0xFF)
        tag = rec.get("tag")
        added = rec.get("added")
        java_rows.append((
            float(rec.get("score")),
            rec.get("id"),
            str(tag) if tag is not None else None,
            str(added) if added is not None else None,
            rec.get("n"),
            bytes(barr),
        ))
    dfr.close()
    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=R_EVOLVE)[1])
    assert java_rows == ours


def test_mixed_vintage_directory_scans_as_one_table(spark, tmp_path):
    """Two files written months apart under DIFFERENT schemas (v1 lacks a
    column and uses int ids; v2 has it and long ids) resolve per-file
    into one reader schema through the DataSource API — the multi-vintage
    Avro lake case."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    v1 = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"}]}
    v2 = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "rank", "type": ["null", "long"]}]}
    reader_schema = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "rank", "type": ["null", "long"], "default": None}]}
    a.write_ocf(str(tmp_path / "a_v1.avro"), v1, [(1, "ana"), (2, "bo")], SYNC)
    a.write_ocf(str(tmp_path / "b_v2.avro"), v2, [(3, "cy", 9), (4, "di", None)], SYNC)
    d = str(tmp_path)

    class MixedAvroTestSource(DataSource):
        @classmethod
        def name(cls):
            return "transf_mixed_avro_test"

        def schema(self):
            return "id long, name string, rank long"

        def reader(self, schema):
            opts = self.options

            class _R(DataSourceReader):
                def partitions(self):
                    import glob as g

                    from transf_spark.sources.avro_ocf import scan_block_index

                    parts = []
                    for path in sorted(g.glob(opts["path"] + "/*.avro")):
                        with open(path, "rb") as f:
                            parts.append(InputPartition((path, tuple(scan_block_index(f)))))
                    return parts

                def read(self, partition):
                    from transf_spark.sources.avro_ocf import read_block_range

                    p, blocks = partition.value
                    yield from read_block_range(
                        p, list(blocks), reader_schema=reader_schema
                    )

            return _R()

    spark.dataSource.register(MixedAvroTestSource)
    got = [
        (r.id, r.name, r.rank)
        for r in spark.read.format("transf_mixed_avro_test")
        .option("path", d).load().orderBy("id").collect()
    ]
    assert got == [(1, "ana", None), (2, "bo", None), (3, "cy", 9), (4, "di", None)]


def test_staged_fixture_mixes_schema_vintages(spark):
    """The declared scan_avro_roundtrip staging writes part-0001 under an
    EVOLVED superset schema (extra `vintage` column, annotated n_chars)
    that per-file resolution drops — pin that the mixed-vintage layout is
    really on disk, so the live census keeps exercising resolution."""
    import glob
    import os

    from transf_spark.sources.formats import _staged_avro_dir

    d = _staged_avro_dir(spark, "/root/testdata/sf0.001")
    parts = sorted(glob.glob(os.path.join(d, "*.avro")))
    assert len(parts) >= 2
    names_by_part = {}
    for p in parts:
        with open(p, "rb") as f:
            fields, _, _ = a.scan_header(f)
        names_by_part[os.path.basename(p)] = [n for n, _, _ in fields]
    assert names_by_part["part-0001.avro"] == [
        "doc_id", "text", "lang", "source", "n_chars", "vintage"
    ]
    assert names_by_part["part-0000.avro"] == [
        "doc_id", "text", "lang", "source", "n_chars"
    ]
    # part 2 (round 12): n_chars lands as a MULTI-BRANCH union the
    # reader's resolution folds back into nullable long
    with open(os.path.join(d, "part-0002.avro"), "rb") as f:
        fields, _, _ = a.scan_header(f)
    nc = dict((n, (t, nl)) for n, t, nl in fields)["n_chars"]
    assert nc == (("union", ("null", "long", "int"), ("promote", "long")), False)
    # ...and the round-13 narrowest-branch encoder really put the INT
    # branch (wire index 2) on part 2's wire: decode the first block's
    # raw records and check the branch indexes directly
    with open(os.path.join(d, "part-0002.avro"), "rb") as f:
        wfields, _, codec2 = a.scan_header(f)
        f.seek(0)
        off, n, size = a.scan_block_index(f)[0]
    raw2 = open(os.path.join(d, "part-0002.avro"), "rb").read()
    block = a.decompress_block(codec2, raw2[off : off + size])
    rows2 = a.decode_records(wfields, block, n)
    assert any(r[-1] is not None for r in rows2)  # non-null n_chars exist
    # re-encode one decoded row and confirm the int branch index is what
    # the file carries for it (branch 2 = "int" in ["null","long","int"])
    some = next(r for r in rows2 if r[-1] is not None)
    assert a.encode_record([wfields[-1]], [some[-1]])[0:1] == a.encode_long(2)[0:1]
    # part 3 (round 13): n_chars lands as a LOGICAL timestamp-micros the
    # reader's resolution folds back to the raw nullable long
    with open(os.path.join(d, "part-0003.avro"), "rb") as f:
        fields3, _, _ = a.scan_header(f)
    nc3 = dict((n, (t, nl)) for n, t, nl in fields3)["n_chars"]
    assert nc3 == (("logical", "timestamp-micros", "long"), True)
    # all FIVE supported codecs really are in the directory (round 12)
    codecs = set()
    for p in parts:
        with open(p, "rb") as f:
            codecs.add(a.scan_header(f)[2])
    assert codecs == set(a.CODECS)


# ---------------------------------------------------------------------------
# Enum + fixed (late round 11): the last two named types in the subset.
# ---------------------------------------------------------------------------

ENUM_FIXED_SCHEMA = {
    "type": "record",
    "name": "ef",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "color", "type": {"type": "enum", "name": "c",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "tag", "type": ["null", {"type": "enum", "name": "t",
                                          "symbols": ["A", "B"]}]},
        {"name": "digest", "type": {"type": "fixed", "name": "d4", "size": 4}},
        {"name": "marks", "type": {"type": "array",
                                   "items": {"type": "enum", "name": "m",
                                             "symbols": ["X", "Y"]}}},
    ],
}

_EF_ROW = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.sampled_from(["RED", "GREEN", "BLUE"]),
    st.one_of(st.none(), st.sampled_from(["A", "B"])),
    st.binary(min_size=4, max_size=4),
    st.lists(st.sampled_from(["X", "Y"]), max_size=6),
)


@settings(max_examples=50, deadline=None)
@given(st.lists(_EF_ROW, max_size=20))
def test_enum_fixed_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "ef.avro")
    a.write_ocf(p, ENUM_FIXED_SCHEMA, rows, SYNC, block_rows=5, codec="deflate")
    assert list(a.read_ocf(open(p, "rb").read())[1]) == rows


def test_enum_fixed_value_errors(tmp_path):
    import pytest

    p = str(tmp_path / "ef.avro")
    with pytest.raises(ValueError):  # unknown symbol
        a.write_ocf(p, ENUM_FIXED_SCHEMA, [(1, "PINK", None, b"abcd", [])], SYNC)
    with pytest.raises(ValueError):  # wrong fixed width
        a.write_ocf(p, ENUM_FIXED_SCHEMA, [(1, "RED", None, b"abc", [])], SYNC)
    with pytest.raises(ValueError):  # non-bytes fixed
        a.write_ocf(p, ENUM_FIXED_SCHEMA, [(1, "RED", None, 4, [])], SYNC)
    # out-of-range enum index on decode: write with a wider enum, read the
    # raw bytes back under a schema whose enum has fewer symbols
    a.write_ocf(p, ENUM_FIXED_SCHEMA, [(1, "BLUE", None, b"abcd", [])], SYNC)
    data = open(p, "rb").read()
    import json as _json

    narrow = _json.loads(_json.dumps(ENUM_FIXED_SCHEMA))
    narrow["fields"][1]["type"]["symbols"] = ["RED"]
    mutated = data.replace(
        _json.dumps(ENUM_FIXED_SCHEMA, separators=(",", ":")).encode(),
        _json.dumps(narrow, separators=(",", ":")).encode(),
    )
    # header length changed -> metadata value length differs; rewrite via
    # the codec instead when sizes diverge
    if len(mutated) == len(data):
        with pytest.raises(ValueError):
            list(a.read_ocf(mutated)[1])


def test_enum_fixed_resolution(tmp_path):
    """Widened reader enums resolve; shrunken ones reject at build;
    enum/fixed defaults decode per spec."""
    import pytest

    p = str(tmp_path / "ef.avro")
    a.write_ocf(p, ENUM_FIXED_SCHEMA, [(1, "BLUE", "A", b"abcd", ["X"])], SYNC)
    reader = {
        "type": "record",
        "name": "ef",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "color", "type": {"type": "enum", "name": "c",
                                       "symbols": ["RED", "GREEN", "BLUE", "PINK"]}},
            {"name": "digest", "type": {"type": "fixed", "name": "d4", "size": 4}},
            {"name": "mood", "type": {"type": "enum", "name": "mm",
                                      "symbols": ["OK", "MEH"]}, "default": "MEH"},
            {"name": "pad", "type": {"type": "fixed", "name": "p2", "size": 2},
             "default": "zy"},
        ],
    }
    got = list(a.read_ocf(open(p, "rb").read(), reader_schema=reader)[1])
    assert got == [(1, "BLUE", b"abcd", "MEH", b"zy")]
    shrunk = {"type": "record", "name": "ef", "fields": [
        {"name": "color", "type": {"type": "enum", "name": "c", "symbols": ["RED"]}}]}
    with pytest.raises(ValueError):
        a.build_resolver(shrunk, a.parse_schema(ENUM_FIXED_SCHEMA))
    resized = {"type": "record", "name": "ef", "fields": [
        {"name": "digest", "type": {"type": "fixed", "name": "d4", "size": 8}}]}
    with pytest.raises(ValueError):
        a.build_resolver(resized, a.parse_schema(ENUM_FIXED_SCHEMA))


def test_enum_fixed_cross_implementation_with_java(spark, tmp_path):
    """Enum + fixed written by our codec must decode under the Apache
    Avro Java reader, and the reverse via its jsonDecoder (enum JSON
    value = the symbol string; fixed = a codepoint string)."""
    jvm = spark.sparkContext._jvm
    rows = [
        (1, "RED", "B", b"abcd", ["X", "Y"]),
        (2, "BLUE", None, b"zzzz", []),
    ]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, ENUM_FIXED_SCHEMA, rows, SYNC, block_rows=1)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        tag = rec.get("tag")
        got.append((
            rec.get("id"),
            str(rec.get("color")),
            str(tag) if tag is not None else None,
            bytes(rec.get("digest").bytes()),
            [str(x) for x in rec.get("marks")],
        ))
    dfr.close()
    assert got == rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(ENUM_FIXED_SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for r in rows:
        payload = json.dumps({
            "id": r[0],
            "color": r[1],
            "tag": {"t": r[2]} if r[2] is not None else None,
            "digest": r[3].decode("latin-1"),
            "marks": r[4],
        })
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


def test_alias_resolution_matches_java(spark, tmp_path):
    """Reader-field aliases (the spec's rename mechanism) resolve a
    renamed writer field — and agree with the Java reader's own alias
    handling. The field's own name wins over its aliases."""
    jvm = spark.sparkContext._jvm
    writer = {"type": "record", "name": "d", "fields": [
        {"name": "uid", "type": "long"},
        {"name": "txt", "type": ["null", "string"]}]}
    reader = {"type": "record", "name": "d", "fields": [
        {"name": "user_id", "type": "long", "aliases": ["uid", "id"]},
        {"name": "text", "type": ["null", "string"], "aliases": ["txt"]}]}
    rows = [(7, "a"), (8, None)]
    p = str(tmp_path / "al.avro")
    a.write_ocf(p, writer, rows, SYNC)
    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=reader)[1])
    assert ours == rows

    rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(reader))
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    rdr.setExpected(rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), rdr)
    java_rows = []
    while dfr.hasNext():
        rec = dfr.next()
        t = rec.get("text")
        java_rows.append((rec.get("user_id"), str(t) if t is not None else None))
    dfr.close()
    assert java_rows == ours

    # the field's own name wins over an alias pointing elsewhere
    both = {"type": "record", "name": "d", "fields": [
        {"name": "uid", "type": "long", "aliases": ["txt"]}]}
    got = list(a.read_ocf(open(p, "rb").read(), reader_schema=both)[1])
    assert got == [(7,), (8,)]


# ---------------------------------------------------------------------------
# Snappy codec (late round 11): the optional codec real deployments
# default to, carried by a from-spec pure-Python raw-snappy
# implementation (full-format decoder incl. copies, literal-only
# encoder). Same gates as deflate: property round-trip, both-direction
# Java cross-implementation parity, and the mutation contract.
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(ROW, max_size=25))
def test_snappy_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "s.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=6, codec="snappy")
    _, it = a.read_ocf(open(p, "rb").read())
    import struct as _struct

    pack = lambda r: (r[0], r[1], _struct.pack("<d", r[2]), r[3], r[4])
    assert [pack(r) for r in it] == [pack(r) for r in rows]


def test_snappy_raw_decoder_handles_java_copies(spark):
    """The Java compressor emits real COPY elements (1/2/4-byte offsets,
    overlapping patterns) — our full-format decoder must reproduce its
    input exactly, and our literal-only streams must decode under Java."""
    import os
    import random

    jvm = spark.sparkContext._jvm
    Snappy = jvm.org.xerial.snappy.Snappy
    rnd = random.Random(11)
    cases = [
        b"",
        b"a",
        b"hello hello hello hello snappy snappy snappy" * 50,
        b"abcd" * 5000,  # overlap copies
        bytes(rnd.choice(b"ab") for _ in range(30000)),
        os.urandom(100000),  # incompressible
    ]
    for data in cases:
        assert a.snappy_decompress(bytes(Snappy.compress(data))) == data
        if data:
            assert bytes(Snappy.uncompress(a.snappy_compress(data))) == data
        assert a.snappy_decompress(a.snappy_compress(data)) == data


def test_snappy_cross_implementation_with_java_avro(spark, tmp_path):
    """Files the Java writer produces under CodecFactory.snappyCodec()
    must decode under our codec, and our snappy files under the Java
    reader — including the per-block big-endian CRC32 framing."""
    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"]},
        ],
    }
    rows = [(i, None if i % 7 == 0 else f"text {i} " * (i % 5)) for i in range(200)]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, schema, rows, SYNC, block_rows=50, codec="snappy")
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        t = rec.get("text")
        got.append((rec.get("doc_id"), str(t) if t is not None else None))
    dfr.close()
    assert got == rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.snappyCodec())
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for doc_id, text in rows:
        payload = json.dumps(
            {"doc_id": doc_id, "text": {"string": text} if text is not None else None}
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


def test_snappy_crc_mismatch_rejected(tmp_path):
    """A flipped bit in the record payload must surface as a CRC32
    mismatch (or another ValueError), never as silently wrong rows."""
    import pytest

    p = str(tmp_path / "s.avro")
    rows = [(i, f"t{i}", float(i), i % 2 == 0, None) for i in range(30)]
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=30, codec="snappy")
    good = open(p, "rb").read()
    # flip one byte in the last 4 bytes before the trailing sync (the CRC)
    mutated = bytearray(good)
    mutated[-17] ^= 0xFF
    with pytest.raises(ValueError):
        list(a.read_ocf(bytes(mutated))[1])


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=255),
    st.integers(min_value=0, max_value=10_000),
)
def test_snappy_mutations_decode_or_valueerror(tmp_path_factory, pos, mask, cut):
    p = str(tmp_path_factory.mktemp("avro") / "sm.avro")
    rows = [(i, f"t{i}", float(i), i % 2 == 0, None) for i in range(20)]
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=6, codec="snappy")
    good = open(p, "rb").read()
    mutated = bytearray(good)
    mutated[pos % len(good)] ^= mask
    for buf in (bytes(mutated), good[: cut % (len(good) + 1)]):
        try:
            _, it = a.read_ocf(buf)
            list(it)
        except ValueError:
            continue


def test_resolution_rejects_nonnull_union_default_and_bad_aliases():
    """Spec: a nullable union's default must be null (first branch), and
    aliases must be a list of strings — both malformed forms reject at
    resolver build instead of silently diverging from the Java parser."""
    import pytest

    wf = a.parse_schema(W_EVOLVE)
    with pytest.raises(ValueError):
        a.build_resolver({"type": "record", "name": "d", "fields": [
            {"name": "extra", "type": ["null", "long"], "default": 5}]}, wf)
    with pytest.raises(ValueError):
        a.build_resolver({"type": "record", "name": "d", "fields": [
            {"name": "user_id", "type": "long", "aliases": "id"}]}, wf)


def test_record_default_subfield_fallback_matches_java(spark, tmp_path):
    """Round-11 ADVICE: a subfield ABSENT from a record field's JSON
    default object takes its own declared default (the Java parser's
    behavior) — requiring every subfield rejected spec-valid readers.
    Parity-pinned against the Java GenericDatumReader; a subfield with
    NEITHER presence nor its own default still rejects."""
    jvm = spark.sparkContext._jvm
    writer = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "long"}]}
    reader = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "long"},
        {"name": "meta", "type": {
            "type": "record", "name": "m", "fields": [
                {"name": "x", "type": "long", "default": 7},
                {"name": "y", "type": "string", "default": "hi"}]},
         "default": {"x": 1}}]}
    rows = [(1,), (2,)]
    p = str(tmp_path / "d.avro")
    a.write_ocf(p, writer, rows, SYNC)

    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=reader)[1])
    assert ours == [(1, (1, "hi")), (2, (1, "hi"))]

    rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(reader))
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    rdr.setExpected(rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), rdr)
    java_rows = []
    while dfr.hasNext():
        rec = dfr.next()
        meta = rec.get("meta")
        java_rows.append((rec.get("id"), (meta.get("x"), str(meta.get("y")))))
    dfr.close()
    assert java_rows == ours

    no_fallback = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "long"},
        {"name": "meta", "type": {
            "type": "record", "name": "m", "fields": [
                {"name": "x", "type": "long", "default": 7},
                {"name": "y", "type": "string"}]},
         "default": {"x": 1}}]}
    with pytest.raises(ValueError, match="missing field"):
        list(a.read_ocf(open(p, "rb").read(), reader_schema=no_fallback)[1])


# ---- general unions + named-type references (round 12) ---------------------

UNION_SCHEMA = {
    "type": "record",
    "name": "u",
    "fields": [
        # value surface, null second (wire branch 0 = string)
        {"name": "vs", "type": ["string", "null"]},
        # promote surfaces
        {"name": "pi", "type": ["null", "int", "long"]},
        {"name": "pf", "type": ["float", "double"]},
        # struct surface: member0=string, member1=long, member2=fixed
        {"name": "sv", "type": ["null", "string", "long",
                                {"type": "fixed", "name": "f4", "size": 4}]},
        # named-type reference inside a union (f4 defined above)
        {"name": "rf", "type": ["null", "f4"]},
    ],
}

UNION_ROW = st.tuples(
    st.one_of(st.none(), st.text(max_size=30)),
    st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
    st.floats(allow_nan=False, width=32).map(float),
    st.one_of(
        st.none(),
        st.tuples(st.text(max_size=20), st.none(), st.none()),
        st.tuples(st.none(), st.integers(-(2**63), 2**63 - 1), st.none()),
        st.tuples(st.none(), st.none(), st.binary(min_size=4, max_size=4)),
    ),
    st.one_of(st.none(), st.binary(min_size=4, max_size=4)),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(UNION_ROW, max_size=25))
def test_union_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "u.avro")
    a.write_ocf(p, UNION_SCHEMA, rows, SYNC, block_rows=5)
    _, it = a.read_ocf(open(p, "rb").read())
    assert list(it) == rows


@settings(max_examples=200, deadline=None)
@given(
    pos=st.integers(0, 10_000),
    mask=st.integers(1, 255),
    cut=st.one_of(st.none(), st.integers(0, 10_000)),
)
def test_union_mutations_decode_or_valueerror(tmp_path_factory, pos, mask, cut):
    """The decode-or-ValueError contract holds on union-bearing files."""
    global _UNION_FUZZ_BYTES
    try:
        data = _UNION_FUZZ_BYTES
    except NameError:
        p = str(tmp_path_factory.mktemp("avro") / "u.avro")
        rows = [("s", 5, 1.5, (None, 9, None), b"abcd"),
                (None, None, 2.0, ("x", None, None), None),
                ("t", 2**40, 0.25, (None, None, b"wxyz"), b"ped!")] * 3
        a.write_ocf(p, UNION_SCHEMA, rows, SYNC, block_rows=2)
        data = _UNION_FUZZ_BYTES = open(p, "rb").read()
    mutated = bytearray(data)
    mutated[pos % len(mutated)] ^= mask
    if cut is not None:
        mutated = mutated[: cut % len(mutated)]
    try:
        _, it = a.read_ocf(bytes(mutated))
        list(it)
    except ValueError:
        pass  # the contract: decode or ValueError, never anything else


def test_union_cross_implementation_with_java(spark, tmp_path):
    """All three union surfaces + a named-type reference, cross-tested in
    BOTH directions against the Apache Avro Java library in Spark's jars
    (jsonDecoder staging keys union branches by type/record name)."""
    jvm = spark.sparkContext._jvm
    rows = [
        ("s", 5, 1.5, (None, 9, None), b"abcd"),
        (None, None, 2.0, ("x", None, None), None),
        ("t", -(2**40), 0.25, (None, None, b"wxyz"), b"ped!"),
        ("", 2**31, 3.5, None, b"\x00\x01\x02\x03"),
    ]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, UNION_SCHEMA, rows, SYNC, block_rows=2)

    def jbytes(v):
        bb = v.duplicate()
        out = bytearray()
        while bb.hasRemaining():
            out.append(bb.get() & 0xFF)
        return bytes(out)

    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        vs = rec.get("vs")
        pi = rec.get("pi")
        pf = rec.get("pf")
        sv = rec.get("sv")
        rf = rec.get("rf")
        # re-surface Java's raw branch values the way our codec does
        # (py4j hasattr is always true on JavaObjects — dispatch on the
        # Java class name instead)
        if sv is None:
            sv_t = None
        elif isinstance(sv, int):
            sv_t = (None, sv, None)
        elif "Fixed" in sv.getClass().getSimpleName():
            sv_t = (None, None, bytes(sv.bytes()))
        else:
            sv_t = (str(sv), None, None)
        got.append((
            str(vs) if vs is not None else None,
            int(pi) if pi is not None else None,
            float(pf),
            sv_t,
            bytes(rf.bytes()) if rf is not None else None,
        ))
    dfr.close()
    assert got == rows

    # reverse: Java writes through its own jsonDecoder staging, we read
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(UNION_SCHEMA))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    fixed_json = lambda b: b.decode("latin-1")
    for vs, pi, pf, sv, rf in rows:
        if sv is None:
            sv_j = None
        elif sv[0] is not None:
            sv_j = {"string": sv[0]}
        elif sv[1] is not None:
            sv_j = {"long": sv[1]}
        else:
            sv_j = {"f4": fixed_json(sv[2])}
        payload = json.dumps({
            "vs": {"string": vs} if vs is not None else None,
            # Java jsonEncoder keys int|long branches by which fits
            "pi": None if pi is None else (
                {"int": pi} if -(2**31) <= pi < 2**31 else {"long": pi}),
            "pf": {"float": pf} if abs(pf) < 3.4e38 else {"double": pf},
            "sv": sv_j,
            "rf": {"f4": fixed_json(rf)} if rf is not None else None,
        })
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


def test_union_resolution_matches_java_reader(spark, tmp_path):
    """Union schema-resolution parity with the Java GenericDatumReader:
    writer non-union -> reader union, writer union -> wider reader union,
    and branch-drop narrowing (good values read; the dropped branch's
    values raise per-VALUE, matching Java's lazy AvroTypeException)."""
    jvm = spark.sparkContext._jvm

    def java_read(path, reader_schema):
        rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(reader_schema))
        rdr = jvm.org.apache.avro.generic.GenericDatumReader()
        rdr.setExpected(rsch)
        dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), rdr)
        out = []
        while dfr.hasNext():
            out.append(dfr.next())
        dfr.close()
        return out

    # writer plain string -> reader ["null","string","long"] (struct surface)
    w1 = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "string"}]}
    r1 = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "string", "long"]}]}
    p = str(tmp_path / "w1.avro")
    a.write_ocf(p, w1, [("a",), ("b",)], SYNC)
    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=r1)[1])
    theirs = [(str(rec.get("x")) if rec.get("x") is not None else None,)
              for rec in java_read(p, r1)]
    assert ours == [(("a", None),), (("b", None),)]
    assert [(v[0][0] if v[0] else None,) for v in ours] == theirs

    # writer ["null","long"] -> reader ["null","int","long"] (promote surface)
    w2 = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "long"]}]}
    r2 = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "int", "long"]}]}
    a.write_ocf(p, w2, [(7,), (None,), (2**40,)], SYNC)
    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=r2)[1])
    theirs = [(rec.get("x"),) for rec in java_read(p, r2)]
    assert ours == [(7,), (None,), (2**40,)] == theirs

    # branch drop: writer ["null","string","long"] -> reader ["null","long"];
    # long + null values read, a string value raises per-VALUE in both
    w3 = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "string", "long"]}]}
    r3 = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "long"]}]}
    a.write_ocf(p, w3, [((None, 9),), (None,)], SYNC)
    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=r3)[1])
    theirs = [(rec.get("x"),) for rec in java_read(p, r3)]
    assert ours == [(9,), (None,)] == theirs
    a.write_ocf(p, w3, [(("boom", None),)], SYNC)
    with pytest.raises(ValueError, match="no matching reader branch"):
        list(a.read_ocf(open(p, "rb").read(), reader_schema=r3)[1])
    try:
        java_read(p, r3)
        java_raised = False
    except Exception:
        java_raised = True
    assert java_raised


def test_named_reference_cross_implementation_with_java(spark, tmp_path):
    """Named-type references (incl. namespace qualification) round-trip
    against the Java library in both directions."""
    jvm = spark.sparkContext._jvm
    schema = {
        "type": "record", "name": "top", "namespace": "com.ex",
        "fields": [
            {"name": "a", "type": {"type": "record", "name": "pt", "fields": [
                {"name": "x", "type": "long"}, {"name": "y", "type": "long"}]}},
            {"name": "b", "type": "pt"},
            {"name": "c", "type": ["null", "com.ex.pt"]},
        ],
    }
    rows = [((1, 2), (3, 4), (5, 6)), ((0, 0), (-1, -2), None)]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, schema, rows, SYNC)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        pt = lambda r: (r.get("x"), r.get("y")) if r is not None else None
        got.append((pt(rec.get("a")), pt(rec.get("b")), pt(rec.get("c"))))
    dfr.close()
    assert got == rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for ra, rb, rc in rows:
        payload = json.dumps({
            "a": {"x": ra[0], "y": ra[1]},
            "b": {"x": rb[0], "y": rb[1]},
            "c": {"com.ex.pt": {"x": rc[0], "y": rc[1]}} if rc else None,
        })
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


# ---- bzip2 + xz codecs (round 12: the spec's remaining stdlib codecs) ------

@settings(max_examples=30, deadline=None)
@given(st.lists(ROW, max_size=20), st.sampled_from(["bzip2", "xz"]))
def test_bzip2_xz_roundtrip_property(tmp_path_factory, rows, codec):
    p = str(tmp_path_factory.mktemp("avro") / "c.avro")
    a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=7, codec=codec)
    _, it = a.read_ocf(open(p, "rb").read())
    assert list(it) == rows


@settings(max_examples=150, deadline=None)
@given(
    codec=st.sampled_from(["bzip2", "xz"]),
    pos=st.integers(0, 10_000),
    mask=st.integers(1, 255),
    cut=st.one_of(st.none(), st.integers(0, 10_000)),
)
def test_bzip2_xz_mutations_decode_or_valueerror(tmp_path_factory, codec, pos, mask, cut):
    global _BZXZ_FUZZ
    try:
        cache = _BZXZ_FUZZ
    except NameError:
        cache = _BZXZ_FUZZ = {}
    if codec not in cache:
        p = str(tmp_path_factory.mktemp("avro") / "c.avro")
        rows = [(i, f"t{i}" * 4, i / 3.0, bool(i % 2), bytes([i % 251] * 5))
                for i in range(40)]
        a.write_ocf(p, SCHEMA, rows, SYNC, block_rows=8, codec=codec)
        cache[codec] = open(p, "rb").read()
    mutated = bytearray(cache[codec])
    mutated[pos % len(mutated)] ^= mask
    if cut is not None:
        mutated = mutated[: cut % len(mutated)]
    try:
        _, it = a.read_ocf(bytes(mutated))
        list(it)
    except ValueError:
        pass


def test_bzip2_xz_bombs_rejected():
    """A block expanding past MAX_BLOCK_BYTES must ValueError, not OOM —
    same guard class as the round-11 deflate bomb."""
    import bz2 as _bz2
    import lzma as _lzma

    bomb = b"\x00" * (a.MAX_BLOCK_BYTES + 100)
    with pytest.raises(ValueError, match="exceeds"):
        a.decompress_block("bzip2", _bz2.compress(bomb))
    with pytest.raises(ValueError, match="exceeds"):
        a.decompress_block("xz", _lzma.compress(bomb, format=_lzma.FORMAT_XZ))
    # trailing garbage after a valid stream is data corruption, not slack
    ok = _bz2.compress(b"fine")
    with pytest.raises(ValueError, match="trailing"):
        a.decompress_block("bzip2", ok + b"junk")


def test_bzip2_xz_cross_implementation_with_java(spark, tmp_path):
    """Our bzip2/xz blocks must decode under the Java library's
    commons-compress / xz-java codecs and vice versa (CodecFactory in
    Spark's jars)."""
    jvm = spark.sparkContext._jvm
    rows = [(i, f"héllo-{i}" * 3, i * 0.5, i % 2 == 0, bytes([i % 256] * 4))
            for i in range(60)]
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    for codec, factory in (("bzip2", "bzip2Codec"), ("xz", None)):
        # ours -> Java
        p1 = str(tmp_path / f"ours_{codec}.avro")
        a.write_ocf(p1, SCHEMA, rows, SYNC, block_rows=16, codec=codec)
        dfr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        got = []
        while dfr.hasNext():
            rec = dfr.next()
            blob = rec.get("blob")
            bb = blob.duplicate()
            barr = bytearray()
            while bb.hasRemaining():
                barr.append(bb.get() & 0xFF)
            got.append((rec.get("doc_id"), str(rec.get("text")),
                        float(rec.get("score")), rec.get("flag"), bytes(barr)))
        dfr.close()
        assert got == rows, codec

        # Java -> ours
        if factory == "bzip2Codec":
            cf = jvm.org.apache.avro.file.CodecFactory.bzip2Codec()
        else:
            cf = jvm.org.apache.avro.file.CodecFactory.xzCodec(6)
        reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
        dfw = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter(sch)
        )
        dfw.setCodec(cf)
        p2 = str(tmp_path / f"theirs_{codec}.avro")
        dfw.create(sch, jvm.java.io.File(p2))
        for did, text, score, flag, blob in rows:
            payload = json.dumps({
                "doc_id": did, "score": score, "flag": flag,
                "text": {"string": text},
                "blob": {"bytes": blob.decode("latin-1")},
            })
            dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
            dfw.append(reader.read(None, dec))
        dfw.close()
        hdr_codec = a.scan_header(open(p2, "rb"))[2]
        assert hdr_codec == codec
        assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows, codec


# ---- nested containers (round 12: array-of-array / map-of-map) -------------

NESTED_CONTAINER_SCHEMA = {
    "type": "record",
    "name": "nc",
    "fields": [
        {"name": "mat", "type": {"type": "array",
                                 "items": {"type": "array", "items": "double"}}},
        {"name": "mm", "type": {"type": "map",
                                "values": {"type": "map", "values": "long"}}},
        {"name": "am", "type": ["null", {"type": "array", "items": {
            "type": "map", "values": ["null", "string"]}}]},
    ],
}

_KEY = st.text(
    st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8
)
NESTED_ROW = st.tuples(
    st.lists(st.lists(st.floats(allow_nan=False), max_size=4), max_size=4),
    st.dictionaries(_KEY, st.dictionaries(
        _KEY, st.integers(-(2**63), 2**63 - 1), max_size=3), max_size=3),
    st.one_of(st.none(), st.lists(st.dictionaries(
        _KEY, st.one_of(st.none(), st.text(max_size=10)), max_size=3), max_size=3)),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(NESTED_ROW, max_size=15))
def test_nested_container_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("avro") / "nc.avro")
    a.write_ocf(p, NESTED_CONTAINER_SCHEMA, rows, SYNC, block_rows=4)
    _, it = a.read_ocf(open(p, "rb").read())
    assert list(it) == rows


def test_nested_container_depth_cap():
    deep = "long"
    for _ in range(2 * a.MAX_SCHEMA_DEPTH + 2):
        deep = {"type": "array", "items": deep}
    with pytest.raises(ValueError, match="nests deeper"):
        a.parse_schema({"type": "record", "name": "r",
                        "fields": [{"name": "x", "type": deep}]})


def test_nested_container_resolution_widens_inner_type(tmp_path):
    """Resolution recurses through container-of-container: the innermost
    float widens to the reader's double."""
    w = {"type": "record", "name": "r", "fields": [
        {"name": "m", "type": {"type": "array",
                               "items": {"type": "array", "items": "float"}}}]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "m", "type": {"type": "array",
                               "items": {"type": "array", "items": "double"}}}]}
    p = str(tmp_path / "w.avro")
    a.write_ocf(p, w, [([[1.5, 2.5], []],), ([],)], SYNC)
    got = list(a.read_ocf(open(p, "rb").read(), reader_schema=r)[1])
    assert got == [([[1.5, 2.5], []],), ([],)]


def test_nested_container_cross_implementation_with_java(spark, tmp_path):
    """array<array<double>> + map<string,map<string,long>> in both
    directions against the Java library."""
    jvm = spark.sparkContext._jvm
    schema = {"type": "record", "name": "nc", "fields": [
        {"name": "mat", "type": {"type": "array",
                                 "items": {"type": "array", "items": "double"}}},
        {"name": "mm", "type": {"type": "map",
                                "values": {"type": "map", "values": "long"}}},
    ]}
    rows = [
        ([[1.0, 2.0], [3.0]], {"a": {"x": 1, "y": 2}, "b": {}}),
        ([], {}),
        ([[0.25]], {"z": {"q": -(2**40)}}),
    ]
    p1 = str(tmp_path / "ours.avro")
    a.write_ocf(p1, schema, rows, SYNC, block_rows=2)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p1), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while dfr.hasNext():
        rec = dfr.next()
        mat = [[float(x) for x in inner] for inner in rec.get("mat")]
        mm = {str(k): {str(k2): v2 for k2, v2 in dict(v).items()}
              for k, v in dict(rec.get("mm")).items()}
        got.append((mat, mm))
    dfr.close()
    assert got == rows

    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    p2 = str(tmp_path / "theirs.avro")
    dfw.create(sch, jvm.java.io.File(p2))
    for mat, mm in rows:
        payload = json.dumps({"mat": mat, "mm": mm})
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(sch, payload)
        dfw.append(reader.read(None, dec))
    dfw.close()
    assert list(a.read_ocf(open(p2, "rb").read())[1]) == rows


def test_union_struct_surface_flows_through_spark_datasource(spark, tmp_path):
    """A struct-surface union column must land as a Spark
    struct<member0, member1> row through the Python DataSource API — the
    same executor plumbing the live census uses, proving the spark-avro
    member mapping is Spark-typable end to end (promote surfaces land as
    plain widened columns on the same path)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    schema = {"type": "record", "name": "u", "fields": [
        {"name": "id", "type": "long"},
        {"name": "sv", "type": ["null", "string", "long"]},
        {"name": "pi", "type": ["int", "long"]},
    ]}
    rows = [
        (1, ("a", None), 7),
        (2, (None, 9), 2**40),
        (3, None, -5),
    ]
    path = str(tmp_path / "u.avro")
    a.write_ocf(path, schema, rows, SYNC, block_rows=2, codec="xz")

    class UnionAvroTestSource(DataSource):
        @classmethod
        def name(cls):
            return "transf_union_avro_test"

        def schema(self):
            return "id long, sv struct<member0: string, member1: long>, pi long"

        def reader(self, schema):
            opts = self.options

            class _R(DataSourceReader):
                def partitions(self):
                    from transf_spark.sources.avro_ocf import scan_block_index

                    with open(opts["path"], "rb") as f:
                        index = scan_block_index(f)
                    return [InputPartition((opts["path"], tuple(index)))]

                def read(self, partition):
                    from transf_spark.sources.avro_ocf import read_block_range

                    p, blocks = partition.value
                    yield from read_block_range(p, list(blocks))

            return _R()

    spark.dataSource.register(UnionAvroTestSource)
    df = (
        spark.read.format("transf_union_avro_test")
        .option("path", path)
        .load()
        .orderBy("id")
    )
    got = [
        (r.id, (r.sv.member0, r.sv.member1) if r.sv is not None else None, r.pi)
        for r in df.collect()
    ]
    assert got == rows


def test_union_branch_reorder_resolution_matches_java(spark, tmp_path):
    """Reader union = writer union with branches REORDERED (the classic
    compatible evolution: wire indices shift, values must not): member
    slots follow the READER's non-null order, Java-reader-parity-pinned."""
    jvm = spark.sparkContext._jvm
    w = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["null", "string", "long"]}]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["long", "null", "string"]}]}
    rows = [(("a", None),), ((None, 9),), (None,), (("", None),)]
    p = str(tmp_path / "w.avro")
    a.write_ocf(p, w, rows, SYNC, block_rows=2)
    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=r)[1])
    # reader non-null order: long (member0), string (member1)
    expect = [((None, "a"),), ((9, None),), (None,), ((None, ""),)]
    assert ours == expect

    rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(r))
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    rdr.setExpected(rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), rdr)
    java = []
    while dfr.hasNext():
        v = dfr.next().get("x")
        if v is None:
            java.append((None,))
        elif isinstance(v, int):
            java.append(((v, None),))
        else:
            java.append(((None, str(v)),))
    dfr.close()
    assert java == expect


def test_wide_union_roundtrip_and_linear_parse():
    """A 26-branch union (wide event-type registries) parses, surfaces as
    a 25-member struct, and round-trips — width is linear, only DEPTH is
    capped."""
    branches = ["null"] + [
        {"type": "fixed", "name": f"f{i}", "size": i + 1} for i in range(25)
    ]
    schema = {"type": "record", "name": "w",
              "fields": [{"name": "x", "type": branches}]}
    fields = a.parse_schema(schema)
    desc = fields[0][1]
    assert desc[0] == "union" and len(desc[1]) == 26
    assert desc[2][0] == "struct" and len(desc[2][1]) == 25
    rows = []
    for i in (0, 7, 24):
        member = [None] * 25
        member[i] = bytes([i]) * (i + 1)
        rows.append((tuple(member),))
    rows.append((None,))
    buf = b"".join(a.encode_record(fields, r) for r in rows)
    assert a.decode_records(fields, buf, len(rows)) == rows


# ---- round-12 review regressions (union matching + namespace rules) --------

def test_union_exact_branch_beats_promotion_matches_java(spark, tmp_path):
    """Branch selection is two-pass like the Java ResolvingDecoder: the
    structurally identical reader branch wins BEFORE any promotable one.
    A writer 'string' into reader ['bytes','string'] must land in the
    string member (one promotion-first pass put it in bytes)."""
    jvm = spark.sparkContext._jvm
    w = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "string"}]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": ["bytes", "string"]}]}
    p = str(tmp_path / "w.avro")
    a.write_ocf(p, w, [("hi",), ("",)], SYNC)
    ours = list(a.read_ocf(open(p, "rb").read(), reader_schema=r)[1])
    assert ours == [((None, "hi"),), ((None, ""),)]

    rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(r))
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    rdr.setExpected(rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p), rdr)
    java = []
    while dfr.hasNext():
        v = dfr.next().get("x")
        # Java yields the string branch (Utf8), not ByteBuffer
        java.append(((None, str(v)),))
    dfr.close()
    assert java == ours


def test_namespace_rules_match_java_parser():
    """Round-12 review: name handling is namespace-exact, not bare-name
    aliased — same accept/reject set as the Java Schema.Parser."""
    # two same-bare-name records in different namespaces: spec-valid,
    # including in a union, and identity resolution must not crash
    two_ns = {"type": "record", "name": "top", "fields": [
        {"name": "f0", "type": {"type": "record", "name": "A",
                                "namespace": "y",
                                "fields": [{"name": "q", "type": "long"}]}},
        {"name": "f1", "type": {"type": "record", "name": "A",
                                "namespace": "x",
                                "fields": [{"name": "p", "type": "long"}]}}]}
    assert a.build_resolver(two_ns, a.parse_schema(two_ns)) is None
    in_union = {"type": "record", "name": "t", "fields": [{"name": "x", "type": [
        {"type": "record", "name": "A", "namespace": "x",
         "fields": [{"name": "p", "type": "long"}]},
        {"type": "record", "name": "A", "namespace": "y",
         "fields": [{"name": "q", "type": "long"}]}]}]}
    assert a.parse_schema(in_union)[0][1][0] == "union"
    # a union holding a definition AND a qualified reference to the same
    # type is a duplicate (keyed on fullname either way)
    with pytest.raises(ValueError, match="duplicate union branch"):
        a.parse_schema({"type": "record", "name": "t", "namespace": "x",
                        "fields": [
            {"name": "a", "type": {"type": "record", "name": "A",
                                   "fields": [{"name": "p", "type": "long"}]}},
            {"name": "y", "type": ["A", "x.A"]}]})
    # an unqualified reference resolves through the ENCLOSING namespace
    # ONLY — a bare 'A' cannot bind to y.A from inside namespace x
    with pytest.raises(ValueError, match="unsupported type 'A'"):
        a.parse_schema({"type": "record", "name": "t", "namespace": "x",
                        "fields": [
            {"name": "a", "type": {"type": "record", "name": "A",
                                   "namespace": "y",
                                   "fields": [{"name": "p", "type": "long"}]}},
            {"name": "b", "type": "A"}]})
    # ...but binds fine when x.A is what the enclosing namespace defines
    ok = {"type": "record", "name": "t", "namespace": "x", "fields": [
        {"name": "a", "type": {"type": "record", "name": "A",
                               "fields": [{"name": "p", "type": "long"}]}},
        {"name": "b", "type": "A"}]}
    assert a.parse_schema(ok)[1][1][0] == "record"


def test_record_default_fallback_through_named_reference(tmp_path):
    """Round-12 review: the subfield-own-default fallback works when the
    record type is reached through a named reference (raw deref inside
    _default_value)."""
    w = {"type": "record", "name": "d", "fields": [{"name": "id", "type": "long"}]}
    r = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "long"},
        {"name": "qq", "type": {"type": "record", "name": "Q", "fields": [
            {"name": "b", "type": "long", "default": 9}]},
         "default": {"b": 1}},
        {"name": "f1", "type": {"type": "record", "name": "W", "fields": [
            {"name": "inner", "type": "Q", "default": {}}]},
         "default": {}}]}
    p = str(tmp_path / "d.avro")
    a.write_ocf(p, w, [(1,), (2,)], SYNC)
    got = list(a.read_ocf(open(p, "rb").read(), reader_schema=r)[1])
    assert got == [(1, (1,), ((9,),)), (2, (1,), ((9,),))]


def test_xz_dictionary_bomb_rejected():
    """Round-12 review: a 60-byte block whose LZMA2 header demands a
    1 GiB dictionary must ValueError at the memlimit, not malloc. The
    fixture bytes are PINNED (lzma.compress(b"hi", filters=[{"id":
    FILTER_LZMA2, "dict_size": 1<<30}])) — re-encoding them at test time
    would itself allocate the gigabyte dictionary and OOM a
    memory-capped CI container before the guard under test ever ran."""
    bomb = bytes.fromhex(
        "fd377a585a000004e6d6b44602002101240000005e1fc7f90100016869000000"
        "fea93811bccaa54800011a02dc2ea57e1fb6f37d010000000004595a"
    )
    with pytest.raises(ValueError, match="bad xz block"):
        a.decompress_block("xz", bomb)


def test_same_shape_union_branches_never_misplace(tmp_path):
    """Round-12 review #2: descriptors are structural (no fullnames), so
    selecting between two SAME-SHAPE named branches is name-information
    this codec cannot express. Reading a file under its own schema is
    index-driven and stays correct; any cross-schema resolution against
    such a union REJECTS at build instead of silently putting the value
    in the wrong member (which is what a shape-first match would do)."""
    sch = {"type": "record", "name": "r", "fields": [{"name": "x", "type": [
        "null",
        {"type": "record", "name": "B", "fields": [{"name": "v", "type": "long"}]},
        {"type": "record", "name": "A", "fields": [{"name": "v", "type": "long"}]}]}]}
    p = str(tmp_path / "s.avro")
    rows = [(((7,), None),), ((None, (9,)),), (None,)]
    a.write_ocf(p, sch, rows, SYNC)
    assert list(a.read_ocf(open(p, "rb").read())[1]) == rows
    assert a.build_resolver(sch, a.parse_schema(sch)) is None
    narrower = {"type": "record", "name": "r", "fields": [{"name": "x", "type": [
        "null",
        {"type": "record", "name": "A", "fields": [{"name": "v", "type": "long"}]}]}]}
    with pytest.raises(ValueError, match="structurally identical"):
        a.build_resolver(sch, a.parse_schema(narrower))
    with pytest.raises(ValueError, match="structurally identical"):
        list(a.read_ocf(open(p, "rb").read(), reader_schema=narrower)[1])


def test_null_namespace_fallback_matches_java_parser():
    """Round-12 review #2: Java's Names.get tries the enclosing namespace
    THEN the null namespace — a namespace-free type referenced by bare
    name from inside a namespaced record must bind (the enclosing-only
    rule rejected Java-valid schemas); an unrelated namespace still
    never binds."""
    ok = {"type": "record", "name": "t", "fields": [
        {"name": "a", "type": {"type": "fixed", "name": "F", "size": 4}},
        {"name": "b", "type": {"type": "record", "name": "n.Box",
                               "fields": [{"name": "f", "type": "F"}]}}]}
    fields = a.parse_schema(ok)
    assert fields[1][1] == ("record", (("f", ("fixed", 4), False),))


def test_bare_reference_disambiguates_through_enclosing_namespace(tmp_path):
    """Round-12 review #2: with x.A and y.A both defined, a bare 'A'
    inside namespace x binds to x.A — including through REAL evolution
    (reader adds a defaulted field), where the raw resolution walk needs
    the same namespace context parse had."""
    r = {"type": "record", "name": "top", "namespace": "x", "fields": [
        {"name": "f0", "type": {"type": "record", "name": "A", "namespace": "y",
                                "fields": [{"name": "q", "type": "long"}]}},
        {"name": "fA", "type": {"type": "record", "name": "A", "fields": [
            {"name": "p", "type": "long"},
            {"name": "r", "type": "long", "default": 5}]}},
        {"name": "b", "type": "A"}]}
    w = {"type": "record", "name": "top", "namespace": "x", "fields": [
        {"name": "f0", "type": {"type": "record", "name": "A", "namespace": "y",
                                "fields": [{"name": "q", "type": "long"}]}},
        {"name": "fA", "type": {"type": "record", "name": "A", "fields": [
            {"name": "p", "type": "long"}, {"name": "r", "type": "long"}]}},
        {"name": "b", "type": {"type": "record", "name": "A2",
                               "fields": [{"name": "p", "type": "long"}]}}]}
    p = str(tmp_path / "w.avro")
    a.write_ocf(p, w, [((1,), (2, 3), (4,))], SYNC)
    got = list(a.read_ocf(open(p, "rb").read(), reader_schema=r)[1])
    assert got == [((1,), (2, 3), (4, 5))]


def test_zero_byte_items_decode_and_forged_counts_reject(tmp_path):
    """Round-12 soak finding: fixed(0) values cost ZERO wire bytes, so
    (a) arrays/records of them are legal and must round-trip (the old
    'each entry costs >= 1 byte' count bound falsely rejected them), and
    (b) with no byte cost to bound them, forged counts must hit the
    explicit MAX_ZERO_BYTE_ITEMS ceiling instead of allocating freely."""
    s = {"type": "record", "name": "root", "fields": [
        {"name": "c0", "type": "long"},
        {"name": "c1", "type": {"type": "fixed", "name": "t1", "size": 0}},
        {"name": "c2", "type": {"type": "array",
                                "items": {"type": "fixed", "name": "t3", "size": 0}}}]}
    rows = [(0, b"", [b"", b""]), (7, b"", []), (-1, b"", [b""] * 5)]
    p = str(tmp_path / "z.avro")
    a.write_ocf(p, s, rows, SYNC)
    assert list(a.read_ocf(open(p, "rb").read())[1]) == rows

    fields = a.parse_schema(s)
    hostile = a.encode_long(1) + a.encode_long(10**9)
    with pytest.raises(ValueError, match="zero-byte-item ceiling"):
        a.decode_records(fields, hostile, 1)

    zrec = a.parse_schema({"type": "record", "name": "z", "fields": [
        {"name": "a", "type": {"type": "fixed", "name": "f0", "size": 0}}]})
    with pytest.raises(ValueError, match="zero-byte-item ceiling"):
        a.decode_records(zrec, b"", 10**9)
    assert a.decode_records(zrec, b"", 3) == [(b"",)] * 3

    # ordinary >=1-byte items keep the tighter size-aware bound
    arr = a.parse_schema({"type": "record", "name": "n", "fields": [
        {"name": "xs", "type": {"type": "array", "items": "long"}}]})
    with pytest.raises(ValueError, match="bad array block count"):
        a.decode_records(arr, a.encode_long(10**6) + b"\x02", 1)


# ---- round-13 ADVICE regression (definition-site namespace in deref) --------

def test_deref_walk_uses_definition_site_namespace(spark, tmp_path):
    """Round-13 ADVICE: after _raw_deref, the walk INTO a definition must
    continue under the DEFINITION site's namespace, not the reference
    site's. With null-ns leaf{x default 1} and b.leaf{x default 2}, a
    null-ns 'inner' referencing bare 'leaf', and b.mid referencing
    'inner': recomputing the namespace from the reference site re-bound
    inner's bare 'leaf' to b.leaf — silently decoding x=2 where the Java
    parser (Names.get binds through the definition site) yields x=1.
    Both affected paths are pinned: default filling (reader-only field)
    and the nested build_resolver walk (matched evolving field)."""
    jvm = spark.sparkContext._jvm

    # Path 1: reader-only field of type b.mid with default {} — the
    # filled default walks mid -> inner -> leaf through two derefs.
    writer1 = {"type": "record", "name": "top", "fields": [
        {"name": "id", "type": "long"}]}
    reader1 = {"type": "record", "name": "top", "fields": [
        {"name": "id", "type": "long"},
        {"name": "a", "type": {"type": "record", "name": "leaf", "fields": [
            {"name": "x", "type": "long", "default": 1}]},
         "default": {"x": 10}},
        {"name": "b_", "type": {"type": "record", "name": "leaf",
                                "namespace": "b", "fields": [
            {"name": "x", "type": "long", "default": 2}]},
         "default": {"x": 20}},
        {"name": "c", "type": {"type": "record", "name": "inner", "fields": [
            {"name": "l", "type": "leaf", "default": {}}]},
         "default": {}},
        {"name": "d", "type": {"type": "record", "name": "mid",
                               "namespace": "b", "fields": [
            {"name": "i", "type": "inner", "default": {}}]},
         "default": {}}]}
    p1 = str(tmp_path / "w1.avro")
    a.write_ocf(p1, writer1, [(1,), (2,)], SYNC)
    ours1 = list(a.read_ocf(open(p1, "rb").read(), reader_schema=reader1)[1])
    assert ours1 == [(1, (10,), (20,), ((1,),), (((1,),),)),
                     (2, (10,), (20,), ((1,),), (((1,),),))]

    rsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(reader1))
    rdr = jvm.org.apache.avro.generic.GenericDatumReader()
    rdr.setExpected(rsch)
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p1), rdr)
    java1 = []
    while dfr.hasNext():
        rec = dfr.next()
        java1.append((rec.get("id"),
                      (rec.get("a").get("x"),),
                      (rec.get("b_").get("x"),),
                      ((rec.get("c").get("l").get("x"),),),
                      (((rec.get("d").get("i").get("l").get("x"),),),)))
    dfr.close()
    assert java1 == ours1

    # Path 2: matched evolving field — the nested build_resolver walk
    # reads the ADDED subfield's default from the deref'd raw dict; the
    # wrong twin would fill y=2 inside d instead of 1.
    writer2 = {"type": "record", "name": "top", "fields": [
        {"name": "a", "type": {"type": "record", "name": "leaf", "fields": [
            {"name": "x", "type": "long"}]}},
        {"name": "b_", "type": {"type": "record", "name": "leaf",
                                "namespace": "b", "fields": [
            {"name": "x", "type": "long"}]}},
        {"name": "c", "type": {"type": "record", "name": "inner", "fields": [
            {"name": "l", "type": "leaf"}]}},
        {"name": "d", "type": {"type": "record", "name": "mid",
                               "namespace": "b", "fields": [
            {"name": "i", "type": "inner"}]}}]}
    reader2 = {"type": "record", "name": "top", "fields": [
        {"name": "a", "type": {"type": "record", "name": "leaf", "fields": [
            {"name": "x", "type": "long"},
            {"name": "y", "type": "long", "default": 1}]}},
        {"name": "b_", "type": {"type": "record", "name": "leaf",
                                "namespace": "b", "fields": [
            {"name": "x", "type": "long"},
            {"name": "y", "type": "long", "default": 2}]}},
        {"name": "c", "type": {"type": "record", "name": "inner", "fields": [
            {"name": "l", "type": "leaf"}]}},
        {"name": "d", "type": {"type": "record", "name": "mid",
                               "namespace": "b", "fields": [
            {"name": "i", "type": "inner"}]}}]}
    p2 = str(tmp_path / "w2.avro")
    a.write_ocf(p2, writer2, [((5,), (6,), ((7,),), (((8,),),))], SYNC)
    ours2 = list(a.read_ocf(open(p2, "rb").read(), reader_schema=reader2)[1])
    assert ours2 == [((5, 1), (6, 2), ((7, 1),), (((8, 1),),))]

    rsch2 = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(reader2))
    rdr2 = jvm.org.apache.avro.generic.GenericDatumReader()
    rdr2.setExpected(rsch2)
    dfr2 = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(p2), rdr2)
    java2 = []
    while dfr2.hasNext():
        rec = dfr2.next()
        l = rec.get("c").get("l")
        dl = rec.get("d").get("i").get("l")
        java2.append(((rec.get("a").get("x"), rec.get("a").get("y")),
                      (rec.get("b_").get("x"), rec.get("b_").get("y")),
                      ((l.get("x"), l.get("y")),),
                      (((dl.get("x"), dl.get("y")),),)))
    dfr2.close()
    assert java2 == ours2


def test_docs_reader_yields_arrow_batches(tmp_path):
    """The flat docs schema must take the Arrow fast path (round 13) —
    a silent regression to per-row tuples would still pass the value
    tests while reinstating the pickling hand-off."""
    from transf_spark.sources import formats

    schema = {"type": "record", "name": "document", "fields": [
        {"name": "doc_id", "type": ["null", "long"]},
        {"name": "text", "type": ["null", "string"]},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "source", "type": ["null", "string"]},
        {"name": "n_chars", "type": ["null", "long"]}]}
    p = str(tmp_path / "d.avro")
    a.write_ocf(p, schema, [(1, "t", "en", "s", 1)], SYNC)
    reader = formats._AvroDocsReader({"path": str(tmp_path)})
    (part,) = reader.partitions()
    items = list(reader.read(part))
    assert len(items) == 1 and hasattr(items[0], "num_rows")
    assert items[0].num_rows == 1
