"""Shared synthetic-documents fixture writer.

One definition of the documents.parquet schema for every test that builds
an adversarial corpus (hot-bucket families, borderline jaccard pairs,
degenerate-text edges) — a schema change to the documents table lands in
one place instead of four copy-pasted pyarrow blocks (round-6 review).

Rows are (doc_id, text, lang, source, n_chars); pass n_chars=None to
derive it from the text (len, or 0 for NULL text).
"""

from __future__ import annotations

import os


def write_documents(out_dir: str, rows) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    norm = [
        (
            r[0],
            r[1],
            r[2],
            r[3],
            (len(r[1]) if r[1] is not None else 0) if (len(r) < 5 or r[4] is None) else r[4],
        )
        for r in rows
    ]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in norm], pa.int64()),
            "text": pa.array([r[1] for r in norm], pa.string()),
            "lang": pa.array([r[2] for r in norm], pa.string()),
            "source": pa.array([r[3] for r in norm], pa.string()),
            "n_chars": pa.array([r[4] for r in norm], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    return out_dir
