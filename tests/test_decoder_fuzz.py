"""Property fuzz for the two dependency-free binary decoders (decode_pgm,
decode_wav): on ARBITRARY bytes — random garbage, truncations, and
mutations of valid files — a decoder must either return a decoded result
or raise ValueError (its declared malformed-input contract). Any other
exception (struct.error, IndexError, OverflowError, numpy errors) is a
contract bug: the mapInPandas workers wrap nothing, so a non-ValueError
escape becomes an opaque executor-side PythonException at 100 TB instead
of a diagnosable per-file reject."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from transf_spark.operators.multimodal import decode_pgm, decode_wav


def _valid_wav(samples: bytes, rate: int = 8000) -> bytes:
    body = (
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _valid_pgm(w: int, h: int) -> bytes:
    return f"P5 {w} {h} 255\n".encode() + bytes(range(256)) * ((w * h) // 256 + 1)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_wav_garbage_never_escapes_valueerror(buf):
    try:
        rate, vec = decode_wav(buf)
    except ValueError:
        return
    assert rate > 0 and isinstance(vec, np.ndarray)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_pgm_garbage_never_escapes_valueerror(buf):
    try:
        w, h, px = decode_pgm(buf)
    except ValueError:
        return
    assert w > 0 and h > 0 and px.size == w * h


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=119),  # mutation position
    st.integers(min_value=1, max_value=255),  # xor mask (nonzero => real flip)
    st.integers(min_value=0, max_value=120),  # truncation point
)
def test_wav_mutations_decode_or_valueerror(pos, mask, cut):
    good = _valid_wav(struct.pack("<38h", *range(38)))
    assert len(good) == 120
    mutated = bytearray(good)
    mutated[pos] ^= mask
    for buf in (bytes(mutated), good[:cut]):
        try:
            rate, vec = decode_wav(buf)
        except ValueError:
            continue
        assert rate > 0 and isinstance(vec, np.ndarray)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=75),
    st.integers(min_value=1, max_value=255),
    st.integers(min_value=0, max_value=76),
)
def test_pgm_mutations_decode_or_valueerror(pos, mask, cut):
    good = _valid_pgm(8, 8)[: len("P5 8 8 255\n") + 64]
    mutated = bytearray(good)
    mutated[pos % len(good)] ^= mask
    for buf in (bytes(mutated), good[:cut]):
        try:
            w, h, px = decode_pgm(buf)
        except ValueError:
            continue
        assert px.size == w * h
