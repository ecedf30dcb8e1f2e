"""Multimodal feature pipeline: the vectorized mapInPandas stage must agree
with a straightforward per-row recomputation (guards the numpy batch math),
and the declared query must be deterministic across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from transf_spark.operators.multimodal import _decode_stub, media_feature_rows
from transf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_media_features_match_per_row_reference(spark):
    got = {
        r["doc_id"]: (r["n_bytes"], r["width"], r["height"], r["n_frames"], r["feature_norm"])
        for r in media_feature_rows(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs) > 0
    for r in docs:
        data = r["text"].encode("utf-8")
        w, h, nf = _decode_stub(data)
        want = (len(data), w, h, nf, round(sum(data[:64]) / (64.0 * 255.0), 9))
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_media_features_deterministic(spark):
    a = sorted(map(tuple, media_feature_rows(spark, SF).collect()))
    b = sorted(map(tuple, media_feature_rows(spark, SF).collect()))
    assert a == b


def test_frame_sample_expansion_matches_stub_decode(spark):
    """Every doc yields ceil(n_frames / stride) rows with stride-spaced
    indices and offsets consistent with the stub decode."""
    from transf_spark.operators.multimodal import (
        FRAME_STRIDE,
        THUMB_MAX,
        frame_sample_rows,
    )

    rows = frame_sample_rows(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    assert len(by_doc) == len(docs)
    for d in docs:
        data = d["text"].encode("utf-8")
        w, h, n_frames = _decode_stub(data)
        got = sorted(by_doc[d["doc_id"]], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(0, n_frames, FRAME_STRIDE))
        frame_bytes = max(1, len(data) // max(1, n_frames))
        scale = THUMB_MAX / max(w, h)
        for r in got:
            assert r["frame_offset"] == r["frame_idx"] * frame_bytes
            assert r["thumb_w"] == max(1, int(w * scale))
            assert r["thumb_h"] == max(1, int(h * scale))
            assert max(r["thumb_w"], r["thumb_h"]) <= THUMB_MAX


def test_pgm_decoder_is_a_real_decoder():
    """decode_pgm must behave like any decoder: parse valid images
    (round-trip against a hand-built PGM) and REJECT malformed input —
    wrong magic, wrong maxval, truncated pixel plane."""
    import numpy as np
    import pytest

    from transf_spark.operators.multimodal import decode_pgm

    px = bytes(range(6))
    w, h, plane = decode_pgm(b"P5 3 2 255\n" + px)
    assert (w, h) == (3, 2)
    assert np.array_equal(plane, np.frombuffer(px, dtype=np.uint8))

    with pytest.raises(ValueError, match="not an 8-bit PGM"):
        decode_pgm(b"P6 3 2 255\n" + px)
    with pytest.raises(ValueError, match="not an 8-bit PGM"):
        decode_pgm(b"P5 3 2 65535\n" + px)
    with pytest.raises(ValueError, match="pixel payload"):
        decode_pgm(b"P5 3 2 255\n" + px[:-1])


def test_pgm_decoder_rejects_short_header():
    """Truncated header (missing maxval) must raise the decoder's own
    diagnostic, not a bare tuple-unpack error (review finding)."""
    import pytest

    from transf_spark.operators.multimodal import decode_pgm

    with pytest.raises(ValueError, match="not an 8-bit PGM"):
        decode_pgm(b"P5 3 2\n" + bytes(6))


def test_pgm_decoder_rejects_bad_dimensions():
    """Negative or non-integer dimensions must be rejected with the
    decoder's diagnostic — '-32 -16' multiplies to a plausible pixel count
    and previously slipped through (review finding)."""
    import pytest

    from transf_spark.operators.multimodal import decode_pgm

    with pytest.raises(ValueError, match="not an 8-bit PGM"):
        decode_pgm(b"P5 -32 -16 255\n" + bytes(512))
    with pytest.raises(ValueError, match="not an 8-bit PGM"):
        decode_pgm(b"P5 x 2 255\n" + bytes(6))
    with pytest.raises(ValueError, match="not an 8-bit PGM"):
        decode_pgm(b"P5 0 0 255\n")


def test_wav_decoder_is_a_real_decoder():
    """decode_wav must behave like any decoder: parse valid RIFF/WAVE PCM
    (including a chunk it doesn't know, skipped by the generic walk) and
    raise on malformed envelopes, wrong formats, and truncated data."""
    import struct

    import numpy as np
    import pytest

    from transf_spark.operators.multimodal import decode_wav

    def wav(samples: bytes, *, rate=8000, fmt=1, ch=1, bits=16, extra=b""):
        blk = ch * bits // 8
        body = (
            b"fmt " + struct.pack("<IHHIIHH", 16, fmt, ch, rate, rate * blk, blk, bits)
            + extra
            + b"data" + struct.pack("<I", len(samples)) + samples
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    s = struct.pack("<4h", 100, -200, 32767, -32768)
    rate, vec = decode_wav(wav(s))
    assert rate == 8000
    assert vec.tolist() == [100, -200, 32767, -32768]
    assert vec.dtype == np.dtype("<i2")

    # unknown chunk between fmt and data is skipped (word-aligned walk)
    rate, vec = decode_wav(wav(s, extra=b"LIST" + struct.pack("<I", 3) + b"abc\x00"))
    assert vec.size == 4

    with pytest.raises(ValueError):  # not RIFF
        decode_wav(b"RIFX" + wav(s)[4:])
    with pytest.raises(ValueError):  # RIFF size lies
        buf = bytearray(wav(s)); buf[4] ^= 0xFF
        decode_wav(bytes(buf))
    with pytest.raises(ValueError):  # float PCM
        decode_wav(wav(s, fmt=3))
    with pytest.raises(ValueError):  # stereo
        decode_wav(wav(s, ch=2))
    with pytest.raises(ValueError):  # 8-bit
        decode_wav(wav(s, bits=8))
    with pytest.raises(ValueError):  # truncated file (RIFF-size check)
        decode_wav(wav(s)[:-2])
    with pytest.raises(ValueError):  # truncated data chunk: size field
        # claims 2 more bytes than the buffer holds while the RIFF size
        # still matches, so the chunk walk itself must catch it
        buf = bytearray(wav(s))
        data_size_at = 12 + 24 + 4  # RIFF hdr + fmt chunk + b"data"
        assert buf[data_size_at - 4 : data_size_at] == b"data"
        buf[data_size_at : data_size_at + 4] = struct.pack("<I", len(s) + 2)
        buf[4:8] = struct.pack("<I", len(buf) - 8)
        decode_wav(bytes(buf))
    with pytest.raises(ValueError):  # duplicate data chunk
        dup = b"data" + struct.pack("<I", len(s)) + s
        body = wav(s, extra=b"")[12:] + dup
        decode_wav(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    with pytest.raises(ValueError):  # duplicate fmt chunk
        fmt2 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        decode_wav(wav(s, extra=fmt2))
    with pytest.raises(ValueError):  # 1-7 byte trailing fragment
        good = wav(s) + b"\x00\x00\x00"
        buf = bytearray(good)
        buf[4:8] = struct.pack("<I", len(buf) - 8)
        decode_wav(bytes(buf))
    with pytest.raises(ValueError):  # data before fmt
        body = b"data" + struct.pack("<I", len(s)) + s
        decode_wav(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def test_audio_decode_edge_and_unicode_fixtures(spark, tmp_path):
    """The audio twin of the image decoder is excluded from the docs
    sweeps' auto-discovery (its docstring's binaryFile mention trips the
    API-usage exclusion, same as multimodal_image_decode) — so run the
    SAME degenerate + multilingual gates explicitly: empty texts, unicode
    texts, and NULL text must neither error nor diverge from the md5
    oracle."""
    import duckdb

    from tests.docfixtures import write_documents
    from tests.oracle import compare
    from transf_spark.queries import all_specs

    spec = all_specs()["multimodal_audio_decode"]
    rows = [
        (1, "", "en", "s"),  # empty text — md5("") still decodes
        (2, None, "en", "s"),  # NULL text — filtered in both dialects
        (3, "héllo wörld 日本語 🎉", "xx", "s"),  # multilingual
        (4, "plain ascii", "en", "s"),
        (5, "İstanbul ısı STRASSE ß", "tr", "s"),  # case hazards
    ]
    d = write_documents(str(tmp_path), rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    try:
        problems = compare(spec.fn(spark, d), con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)


def test_wav_roundtrip_property():
    """Property: encode(int16 samples) → decode_wav is the identity on
    samples and rate, for arbitrary sample content (including extremes)
    and odd chunk paddings — pure Python, no Spark session."""
    import struct

    import numpy as np
    from hypothesis import given, settings, strategies as st

    from transf_spark.operators.multimodal import decode_wav

    @settings(max_examples=200, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64
        ),
        rate=st.sampled_from([8000, 16000, 44100, 48000]),
        junk=st.binary(min_size=0, max_size=9),
    )
    def check(samples, rate, junk):
        data = struct.pack(f"<{len(samples)}h", *samples)
        # optional unknown chunk before data, word-aligned per the RIFF spec
        extra = b""
        if junk:
            extra = b"JUNK" + struct.pack("<I", len(junk)) + junk
            if len(junk) % 2:
                extra += b"\x00"
        body = (
            b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + extra
            + b"data" + struct.pack("<I", len(data)) + data
        )
        buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        got_rate, got = decode_wav(buf)
        assert got_rate == rate
        assert got.tolist() == samples
        assert got.dtype == np.dtype("<i2")

    check()


def test_decode_stub_batch_matches_scalar_edge_payloads():
    """The vectorized stub decode / prefix-matrix path (r15, guide §4.2)
    must agree byte-for-byte with the scalar reference on degenerate
    payloads: empty, shorter than the 16-byte hash window, shorter than
    the 64-byte feature window, and Arrow-sliced arrays (non-zero
    offset)."""
    import numpy as np
    import pyarrow as pa

    from transf_spark.operators.multimodal import (
        _binary_view,
        _decode_stub,
        _decode_stub_batch,
        _prefix_matrix,
    )

    payloads = [
        b"",
        b"a",
        b"short",
        b"exactly-16-bytes",
        b"x" * 17,
        bytes(range(256)),
        "héllo wörld — multibyte".encode("utf-8"),
        b"\x00" * 64,
        b"\xff" * 200,
    ]
    for arr in (pa.array(payloads, type=pa.binary()),
                pa.array(payloads, type=pa.large_binary()),
                pa.array([b"pad"] + payloads, type=pa.binary()).slice(1)):
        view_payloads = payloads
        offsets, flat = _binary_view(arr)
        prefix64, lengths = _prefix_matrix(offsets, flat, 64)
        assert lengths.tolist() == [len(p) for p in view_payloads]
        for i, p in enumerate(view_payloads):
            assert prefix64[i].tobytes() == p[:64].ljust(64, b"\0")
        w, h, nf = _decode_stub_batch(prefix64[:, :16], lengths)
        for i, p in enumerate(view_payloads):
            assert (w[i], h[i], nf[i]) == _decode_stub(p), p
