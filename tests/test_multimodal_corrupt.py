"""Round-14 (judge verdict item 7): extend the corrupt-embeddings
mini-fixture device (tests/test_embedding_validity.py) to the multimodal
decode family.

Two gates:

1. DEGENERATE-DOCUMENTS fixture through the FULL ORACLE PATH — a
   regenerated documents fixture bearing NULL text, empty text, one-char,
   whitespace-only, embedded-NUL, and wide-unicode rows must leave every
   multimodal query and its DuckDB oracle in exact agreement (previously
   only the similarity family had this gate; the decode queries were
   exercised on the clean fixture only).

2. MALFORMED PGM/WAV payloads through the real Spark mapInPandas
   plumbing — a corrupt payload inside an Arrow batch must surface the
   decoder's ValueError through the job (never a silent mis-decode),
   and a valid batch must still produce the exact statistics. Today the
   decoders' rejections were unit-tested on bare bytes only.
"""

from __future__ import annotations

import hashlib
import shutil
import struct

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from tests.oracle import compare
from transf_spark.operators import multimodal as M
from transf_spark.queries import REGISTRY, _load_all_modules

_QUERIES = [
    "multimodal_doc_join",
    "multimodal_media_features",
    "multimodal_frame_sample",
    "multimodal_image_decode",
    "multimodal_audio_decode",
]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    """sf0.001 documents with the text column degraded in place: NULL,
    empty string, single char, whitespace-only, embedded NUL byte, and a
    wide multibyte run (the UTF-8 byte-conservation invariant's sharpest
    inputs). doc_id/lang/source/n_chars kept verbatim so the join keys
    and metadata-only oracles are untouched; embeddings/events copied."""
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("degenerate_sf")
    t = pq.read_table(f"{src}/documents.parquet")
    texts = t["text"].to_pylist()
    texts[0] = None
    texts[1] = ""
    texts[2] = "x"
    texts[3] = " \t\n "
    texts[4] = "nul\x00inside"
    texts[5] = "汉字🙂" * 200
    cols = {name: t[name] for name in t.schema.names}
    cols["text"] = pa.array(texts, pa.string())
    pq.write_table(pa.table(cols), str(out / "documents.parquet"))
    for name in ("embeddings", "events"):
        shutil.copy(f"{src}/{name}.parquet", str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", _QUERIES)
def test_multimodal_family_survives_degenerate_documents(
    spark, degenerate_dir, name
):
    _load_all_modules()
    spec = REGISTRY[name]
    df = spec.fn(spark, degenerate_dir)
    con = duckdb.connect()
    for tbl in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{degenerate_dir}/{tbl}.parquet')"
        )
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


# ---- malformed payloads through the Spark mapInPandas plumbing -------------


def _valid_pgm(seed: bytes) -> bytes:
    digest = hashlib.md5(seed).digest()
    return (
        f"P5 {M.PGM_W} {M.PGM_H} 255\n".encode()
        + digest * (M.PGM_W * M.PGM_H // 16)
    )


def _valid_wav(seed: bytes) -> bytes:
    return M._WAV_HEADER + hashlib.md5(seed).digest() * M.WAV_TILES


_BAD_PGMS = [
    b"P6 32 16 255\n" + b"\0" * 512,          # wrong magic
    b"P5 32 16 255\n" + b"\0" * 100,          # truncated pixel plane
    b"P5 0 16 255\n",                          # zero width
    b"P5 -32 16 255\n" + b"\0" * 512,          # negative width
    b"P5 32 16 65535\n" + b"\0" * 512,         # 16-bit maxval
    b"",                                       # empty payload
]

_BAD_WAVS = [
    b"RIFX" + _valid_wav(b"x")[4:],            # wrong envelope magic
    _valid_wav(b"x")[:40],                     # truncated mid-chunk
    # declared RIFF size disagrees with the payload
    b"RIFF" + struct.pack("<I", 9999) + _valid_wav(b"x")[8:],
    # rate=0 (would emit inf duration if decoded)
    b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE" + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
    + b"data" + struct.pack("<I", 4) + b"\0\0\0\0",
    # odd data size for 16-bit samples
    b"RIFF" + struct.pack("<I", 36 + 3) + b"WAVE" + b"fmt "
    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data" + struct.pack("<I", 3) + b"\0\0\0" + b"\0",
    b"",                                       # empty payload
]


@pytest.mark.parametrize("bad_idx", range(len(_BAD_PGMS)))
def test_malformed_pgm_rejected_through_spark(spark, bad_idx):
    """A malformed PGM row mixed into an otherwise-valid Arrow batch must
    fail the JOB with the decoder's own ValueError — the pipeline never
    silently emits statistics for bytes it could not decode."""
    rows = [(1, _valid_pgm(b"a")), (2, _BAD_PGMS[bad_idx]), (3, _valid_pgm(b"b"))]
    df = spark.createDataFrame(rows, "doc_id long, image binary").coalesce(1)
    out = df.mapInPandas(M._image_batches, schema=M.IMAGE_SCHEMA)
    with pytest.raises(Exception, match="PGM|pixel payload"):
        out.collect()


@pytest.mark.parametrize("bad_idx", range(len(_BAD_WAVS)))
def test_malformed_wav_rejected_through_spark(spark, bad_idx):
    rows = [(1, _valid_wav(b"a")), (2, _BAD_WAVS[bad_idx]), (3, _valid_wav(b"b"))]
    df = spark.createDataFrame(rows, "doc_id long, audio binary").coalesce(1)
    out = df.mapInPandas(M._audio_batches, schema=M.AUDIO_SCHEMA)
    with pytest.raises(Exception, match="RIFF|chunk|PCM|rates|odd data|sample"):
        out.collect()


def test_valid_media_batch_still_exact_through_spark(spark):
    """The rejection gates above must not have dulled the happy path: a
    valid mixed batch through the same mapInPandas kernels reproduces the
    exact integer-moment statistics computed directly in numpy."""
    seeds = [b"alpha", b"beta", b"gamma"]
    img_rows = [(i, _valid_pgm(s)) for i, s in enumerate(seeds)]
    img = (
        spark.createDataFrame(img_rows, "doc_id long, image binary")
        .repartition(2)
        .mapInPandas(M._image_batches, schema=M.IMAGE_SCHEMA)
        .collect()
    )
    assert len(img) == len(seeds)
    for r in sorted(img, key=lambda r: r.doc_id):
        px = np.frombuffer(
            hashlib.md5(seeds[r.doc_id]).digest() * 32, dtype=np.uint8
        ).astype(np.int64)
        assert (r.width, r.height, r.n_pixels) == (M.PGM_W, M.PGM_H, 512)
        assert r.mean_intensity == px.sum() / 512
        assert r.var_intensity == (px * px).sum() / 512 - (px.sum() / 512) ** 2

    wav_rows = [(i, _valid_wav(s)) for i, s in enumerate(seeds)]
    wav = (
        spark.createDataFrame(wav_rows, "doc_id long, audio binary")
        .repartition(2)
        .mapInPandas(M._audio_batches, schema=M.AUDIO_SCHEMA)
        .collect()
    )
    assert len(wav) == len(seeds)
    for r in sorted(wav, key=lambda r: r.doc_id):
        s = np.frombuffer(
            hashlib.md5(seeds[r.doc_id]).digest() * M.WAV_TILES, dtype="<i2"
        ).astype(np.int64)
        assert (r.n_samples, r.sample_rate) == (M.WAV_N_SAMPLES, M.WAV_RATE)
        assert r.duration_s == s.size / M.WAV_RATE
        assert r.rms == np.sqrt((s * s).sum() / s.size)
        assert r.peak == max(s.max(), -s.min())
