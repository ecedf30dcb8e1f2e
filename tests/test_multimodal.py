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
