"""Union-resolution property test against an INDEPENDENT reference model
(round 12): the two review passes both found real bugs in union branch
selection, so this pins the semantics with a model written from the spec
rather than from the implementation.

The container is hand-assembled so the test controls the WIRE branch
index of every value (the codec's write path would re-derive branches
from surfaced values and mask selection bugs). The model mirrors the
DOCUMENTED semantics: exact branch first, then first promotable reader
branch (Java's bestBranch order); a writer int|long / float|double union
surfaces pre-widened, so its values match through the WIDEST branch (the
docstring'd divergence); null maps to None when the reader accepts null
and errors per value otherwise; unmatched branches error per value."""

from __future__ import annotations

import hashlib
import json

from hypothesis import assume, given, settings, strategies as st

from transf_spark.sources import avro_ocf as a

SYNC = hashlib.md5(b"transf_union_prop").digest()

PRIMS = ("string", "bytes", "int", "long", "float", "double", "boolean")
VALS = {
    "string": "txt",
    "bytes": b"\x01\x02",
    "int": -7,
    "long": 2**40,
    "float": 1.5,
    "double": 2.25,
    "boolean": True,
}
# the spec's promotion lattice over these primitives (writer -> readers)
PROMOTABLE = {
    "int": ("long", "float", "double"),
    "long": ("float", "double"),
    "float": ("double",),
    "string": ("bytes",),
    "bytes": ("string",),
}
CONVERT = {
    ("int", "float"): float, ("int", "double"): float,
    ("long", "float"): float, ("long", "double"): float,
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def _ocf_bytes(schema: dict, payload: bytes, count: int) -> bytes:
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    out = bytearray(a.MAGIC)
    out += a.encode_long(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += a.encode_long(len(kb)) + kb + a.encode_long(len(v)) + v
    out += a.encode_long(0)
    out += SYNC
    out += a.encode_long(count) + a.encode_long(len(payload)) + payload + SYNC
    return bytes(out)


def _model(wbranches, rbranches, widx):
    """-> ('ok', surfaced reader value) | ('null', None-or-error) |
    ('err',). Mirrors the documented selection semantics."""
    wb = wbranches[widx]
    if wb == "null":
        return ("ok", None) if "null" in rbranches else ("err",)
    # the writer surface pre-widens int|long and float|double unions
    wnn = [b for b in wbranches if b != "null"]
    v = VALS[wb]
    if len(wnn) > 1 and set(wnn) == {"int", "long"}:
        wb = "long"
    elif len(wnn) > 1 and set(wnn) == {"float", "double"}:
        wb, v = "double", float(VALS[wb])
    rnn = [b for b in rbranches if b != "null"]
    hit = None
    if wb in rnn:
        hit, out = wb, v
    else:
        for rb in rnn:
            if rb in PROMOTABLE.get(wb, ()):
                hit, out = rb, CONVERT.get((wb, rb), lambda x: x)(v)
                break
    if hit is None:
        return ("err",)
    # surface into the reader's shape
    if len(rnn) == 1:
        return ("ok", out)
    if set(rnn) == {"int", "long"} or set(rnn) == {"float", "double"}:
        return ("ok", float(out) if isinstance(out, (int, float)) and set(rnn) == {"float", "double"} else out)
    row = [None] * len(rnn)
    row[rnn.index(hit)] = out
    return ("ok", tuple(row))


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_union_resolution_matches_reference_model(data):
    wnn = data.draw(st.lists(st.sampled_from(PRIMS), min_size=1, max_size=3,
                             unique=True), label="writer branches")
    rnn = data.draw(st.lists(st.sampled_from(PRIMS), min_size=1, max_size=3,
                             unique=True), label="reader branches")
    wnull = data.draw(st.booleans(), label="writer null")
    rnull = data.draw(st.booleans(), label="reader null")
    wbranches = (["null"] if wnull else []) + wnn
    rbranches = rnn + (["null"] if rnull else [])
    # single-branch-no-null readers parse as plain types; keep both sides
    # genuine unions so the test exercises union-vs-union resolution, and
    # keep the null second on the reader so it stays the GENERAL form
    assume(len(wbranches) >= 2 and len(rbranches) >= 2)
    widx = data.draw(st.integers(0, len(wbranches) - 1), label="wire branch")

    w = {"type": "record", "name": "r", "fields": [{"name": "x", "type": wbranches}]}
    r = {"type": "record", "name": "r", "fields": [{"name": "x", "type": rbranches}]}
    wb = wbranches[widx]
    payload = a.encode_long(widx) + (
        b"" if wb == "null" else a._encode_value(wb, VALS[wb])
    )
    data_bytes = _ocf_bytes(w, payload, 1)

    expect = _model(wbranches, rbranches, widx)
    try:
        rows = list(a.read_ocf(data_bytes, reader_schema=r)[1])
    except ValueError:
        assert expect == ("err",), (wbranches, rbranches, widx, expect)
        return
    assert expect[0] == "ok", (wbranches, rbranches, widx, rows)
    assert rows == [(expect[1],)], (wbranches, rbranches, widx, rows, expect)
