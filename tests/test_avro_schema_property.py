"""Composed-schema property test (round 12; logical types round 13):
random schemas over the FULL declared Avro subset — primitives,
nullables, enums, fixed, nested records, nested containers, general
unions, named-type references, logical types — with matching random
rows, round-tripped through the codec. The per-feature suites pin
each shape in isolation; this one exercises their COMPOSITIONS (a union of
a map of a record holding a fixed, an array of logical timestamps, ...),
where descriptor plumbing bugs
hide. Also pins the resolution-identity invariant: for every generated
schema, build_resolver(schema, parse_schema(schema)) is None — identity
must never degrade into a per-row transform (or worse, a rejection: the
round-12 review's namespace-aliasing crash was exactly this class)."""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib

from hypothesis import given, settings, strategies as st

from transf_spark.sources import avro_ocf as a

SYNC = hashlib.md5(b"transf_avro_schema_prop").digest()

_PRIM_VALUES = {
    "long": st.integers(-(2**63), 2**63 - 1),
    "int": st.integers(-(2**31), 2**31 - 1),
    "string": st.text(max_size=12),
    "double": st.floats(allow_nan=False),
    "float": st.floats(allow_nan=False, width=32).map(float),
    "boolean": st.booleans(),
    "bytes": st.binary(max_size=10),
}

_EPOCH_D = dt.date(1970, 1, 1)
_EPOCH_U = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
_EPOCH_N = dt.datetime(1970, 1, 1)

# anonymous (non-fixed) logical types: raw JSON type -> value strategy;
# ranges stay inside Python's year 1-9999 window, decimals are drawn as
# unscaled ints at the schema's exact scale
_LOGICAL_VALUES = {
    ("int", "date"): st.integers(-100_000, 100_000).map(
        lambda n: _EPOCH_D + dt.timedelta(days=n)),
    ("long", "timestamp-millis"): st.integers(-(10**12), 10**13).map(
        lambda n: _EPOCH_U + dt.timedelta(milliseconds=n)),
    ("long", "timestamp-micros"): st.integers(-(10**15), 10**16).map(
        lambda n: _EPOCH_U + dt.timedelta(microseconds=n)),
    ("long", "local-timestamp-millis"): st.integers(-(10**12), 10**13).map(
        lambda n: _EPOCH_N + dt.timedelta(milliseconds=n)),
    ("long", "local-timestamp-micros"): st.integers(-(10**15), 10**16).map(
        lambda n: _EPOCH_N + dt.timedelta(microseconds=n)),
    ("bytes", "decimal"): st.integers(-(10**8) + 1, 10**8 - 1).map(
        lambda n: decimal.Decimal(n).scaleb(-3)),
}


@st.composite
def _type_and_values(draw, depth: int, ctr: list):
    """-> (raw type JSON, value strategy). ctr numbers named types so every
    generated name is unique (the parser rejects redefinition)."""
    prims = list(_PRIM_VALUES)
    kinds = prims + ["logical"] + (
        ["enum", "fixed", "record", "array", "map", "union"] if depth > 0 else ["enum", "fixed"]
    )
    kind = draw(st.sampled_from(kinds))
    if kind in _PRIM_VALUES:
        return kind, _PRIM_VALUES[kind]
    if kind == "logical":
        if draw(st.booleans()):
            (und, lt), v = draw(st.sampled_from(sorted(
                _LOGICAL_VALUES.items(), key=lambda kv: kv[0])))
            t = {"type": und, "logicalType": lt}
            if lt == "decimal":
                t.update(precision=8, scale=3)
            return t, v
        # fixed-backed decimal (a NAMED logical type)
        ctr[0] += 1
        return (
            {"type": "fixed", "name": f"t{ctr[0]}", "size": 5,
             "logicalType": "decimal", "precision": 9, "scale": 2},
            st.integers(-(10**9) + 1, 10**9 - 1).map(
                lambda n: decimal.Decimal(n).scaleb(-2)),
        )
    ctr[0] += 1
    name = f"t{ctr[0]}"
    if kind == "enum":
        syms = [f"S{i}" for i in range(draw(st.integers(1, 4)))]
        return ({"type": "enum", "name": name, "symbols": syms},
                st.sampled_from(syms))
    if kind == "fixed":
        size = draw(st.integers(0, 6))
        return ({"type": "fixed", "name": name, "size": size},
                st.binary(min_size=size, max_size=size))
    if kind == "record":
        nf = draw(st.integers(1, 3))
        fields, fstrats = [], []
        for i in range(nf):
            ft, fv = draw(_type_and_values(depth - 1, ctr))
            nullable = draw(st.booleans()) and not (
                isinstance(ft, list)
            )
            if nullable:
                ft, fv = ["null", ft], st.one_of(st.none(), fv)
            fields.append({"name": f"f{i}", "type": ft})
            fstrats.append(fv)
        return ({"type": "record", "name": name, "fields": fields},
                st.tuples(*fstrats))
    if kind == "array":
        it, iv = draw(_type_and_values(depth - 1, ctr))
        if isinstance(it, list):  # no union items inside this generator's
            it, iv = "long", _PRIM_VALUES["long"]  # nullable-wrap ambiguity
        return ({"type": "array", "items": it}, st.lists(iv, max_size=3))
    if kind == "map":
        vt, vv = draw(_type_and_values(depth - 1, ctr))
        if isinstance(vt, list):
            vt, vv = "string", _PRIM_VALUES["string"]
        keys = st.text(
            st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1, max_size=4,
        )
        return ({"type": "map", "values": vt}, st.dictionaries(keys, vv, max_size=3))
    # union: 2-4 distinct-kind branches, optional null anywhere
    pool = draw(st.permutations(prims))
    n = draw(st.integers(2, 4))
    branches = pool[:n]
    has_null = draw(st.booleans())
    null_pos = draw(st.integers(0, n)) if has_null else None
    raw = list(branches)
    if has_null:
        raw.insert(null_pos, "null")
    desc = a._parse_union(raw, 0)
    surface = desc[2]
    nn = [b for b in raw if b != "null"]
    if surface[0] == "promote":
        v = _PRIM_VALUES[surface[1]]
    elif surface[0] == "value":
        v = _PRIM_VALUES[nn[0]]
    else:
        def member(i):
            return st.tuples(*[
                _PRIM_VALUES[b] if j == i else st.none()
                for j, b in enumerate(nn)
            ])
        v = st.one_of(*[member(i) for i in range(len(nn))])
    if has_null:
        v = st.one_of(st.none(), v)
    return raw, v


@st.composite
def _schema_and_rows(draw):
    ctr = [0]
    nf = draw(st.integers(1, 4))
    fields, fstrats = [], []
    for i in range(nf):
        ft, fv = draw(_type_and_values(2, ctr))
        fields.append({"name": f"c{i}", "type": ft})
        fstrats.append(fv)
    schema = {"type": "record", "name": "root", "fields": fields}
    rows = draw(st.lists(st.tuples(*fstrats), max_size=8))
    return schema, rows


@settings(max_examples=120, deadline=None)
@given(_schema_and_rows(), st.sampled_from(a.CODECS))
def test_composed_schema_roundtrip(tmp_path_factory, sr, codec):
    schema, rows = sr
    p = str(tmp_path_factory.mktemp("avro") / "c.avro")
    a.write_ocf(p, schema, rows, SYNC, block_rows=3, codec=codec)
    fields, it = a.read_ocf(open(p, "rb").read())
    assert list(it) == rows
    # identity resolution must stay the fast path for EVERY subset schema
    assert a.build_resolver(schema, a.parse_schema(schema)) is None
