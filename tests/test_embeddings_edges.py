"""Degenerate-embeddings parity sweep (round-6 third family, after
documents and events): NULL embeddings, zero vectors, tiny norms, NULL
labels, exact-duplicate vectors. The classes this caught on first run
(all fixed, mirrored in both dialects):

- NULL embedding: DuckDB's list_inner_product ERRORS outright, and a
  None row makes the numpy kernel's Arrow batch ragged — ``_emb_double``
  now applies the module-wide ``embedding IS NOT NULL`` input contract,
  mirrored in every similarity oracle;
- the ANN census's exact rows-per-query contract was regeneration-
  fragile (a sparse probe set legitimately returns fewer than k) —
  redefined as bounded + contiguous-rank flags, with exact k still
  pinned by the pytest recall gate on the known fixture.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.docfixtures import write_documents
from tests.oracle import compare
from transf_spark.queries import all_specs

_D = 8


def _vec(seed: int, scale: float = 1.0) -> list[float]:
    return [((seed * 31 + i * 7) % 13 - 6) / 6.0 * scale for i in range(_D)]


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("edge_emb"))
    rows = [
        (0, _vec(1), 0),            # query vector (vec_id % 100 == 0)
        (1, _vec(2), 0),
        (2, _vec(3), 1),
        (3, [0.0] * _D, 1),         # zero vector — 0-norm guard
        (4, _vec(5), None),         # NULL label
        (5, None, 2),               # NULL embedding — input contract
        (6, _vec(1), 2),            # exact duplicate of vec 0
        (100, _vec(9), 3),          # second query
        (7, _vec(2, 1e-30), 3),     # tiny-norm vector
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))
    # documents twin for the multimodal join
    write_documents(
        out, [(i, f"doc text {i} alpha beta", "en", "srcA") for i in range(8)]
    )
    return out


EDGE_EMB_QUERIES = [
    "similarity_topk_cosine",
    "dedup_embedding_cosine",
    "embedding_norm_stats",
    "embedding_quantize_int8",
    "embedding_label_centroid_cosine",
    "similarity_ann_lsh",
    "multimodal_doc_join",
    # round-8 census promotions — the iterative/approximate family must
    # survive NULL embeddings, zero vectors and tiny norms like the rest
    "similarity_ann_ivf",
    "embedding_kmeans",
    "embedding_pca_project",
]


def test_embeddings_sweep_list_is_complete():
    """Completeness guard (round-8 lesson: the docs and TPC-H sweeps had
    silently omitted whole families): every batch embeddings-only oracle
    query must be in EDGE_EMB_QUERIES."""
    import inspect

    others = (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "events",
    )
    for name, spec in all_specs().items():
        if spec.oracle is None or spec.category.startswith("streaming"):
            continue
        src = inspect.getsource(spec.fn) + " " + spec.oracle
        other = any(
            f'"{t}"' in src or f" {t}" in spec.oracle for t in others
        ) or any(api in src for api in ("readStream", "binaryFile"))
        if ('"embeddings"' in src or " embeddings" in spec.oracle) and not other:
            assert name in EDGE_EMB_QUERIES, (
                f"{name} reads only the embeddings table but is missing "
                "from the degenerate embeddings sweep"
            )


@pytest.mark.parametrize("name", EDGE_EMB_QUERIES)
def test_embedding_queries_survive_degenerate_rows(spark, edge_emb_dir, name):
    spec = all_specs()[name]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_emb_dir}/embeddings.parquet')"
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_emb_dir}/documents.parquet')"
    )
    try:
        problems = compare(spec.fn(spark, edge_emb_dir), con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(str(p) for p in problems)


def test_null_embedding_excluded_duplicate_pair_found(spark, edge_emb_dir):
    """Semantics sanity: the NULL-embedding row is excluded by the input
    contract (not crashed on), and the engineered exact-duplicate vector
    pair (0, 6) is still found at cosine ≈ 1."""
    pairs = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in all_specs()["dedup_embedding_cosine"].fn(spark, edge_emb_dir).collect()
    }
    assert (0, 6) in pairs and abs(pairs[(0, 6)] - 1.0) < 1e-9
    assert not any(5 in p for p in pairs), "NULL-embedding row must not pair"


def test_allpairs_kernel_zero_norm_drops():
    """Round-16 triage of the r15 ADVICE (medium): a zero-norm vector
    passes _VALID_EMB (0.0 is finite) and its cosine against anything is
    0/0. numpy yields NaN there and IEEE `>=` drops the pair — which is
    exactly what the ORACLE does: DuckDB's `0.0/0.0` is NULL (not NaN;
    verified live in r16 — the ADVICE's claim that DuckDB would emit the
    pair was empirically wrong), so `cosine >= t` is NULL and the WHERE
    drops it. An `| isnan(cos)` mask was tried and measurably diverged
    (spark=9 vs duckdb=2 on the degenerate edge fixture). This pins the
    DROP as the cross-engine contract, directly on synthetic tiles; the
    degenerate-rows oracle sweep above proves the same end to end."""
    import pandas as pd

    from transf_spark.operators.similarity import _allpairs_tile_kernel

    pa = pd.DataFrame(
        {
            "vec_id_a": [1, 2],
            "va": [[0.0, 0.0], [1.0, 0.0]],
            "na": [0.0, 1.0],
        }
    )
    pb = pd.DataFrame(
        {
            "vec_id_b": [3],
            "vb": [[1.0, 0.0]],
            "nb": [1.0],
        }
    )
    out = _allpairs_tile_kernel(pa, pb)
    pairs = set(zip(out["vec_id_a"], out["vec_id_b"]))
    # zero-norm row 1 vs row 3: NaN cosine — DROPPED (DuckDB NULL parity)
    assert (1, 3) not in pairs
    # unit vectors 2 vs 3: cosine 1.0 >= threshold — emitted
    assert (2, 3) in pairs


def test_brute_topk_query_cap_raises(spark, monkeypatch):
    """Round-16 (r15 verdict item 3): the exact brute-force top-k collects
    its query side to the driver for sparkContext.broadcast, which has no
    built-in size cap — the guard must refuse LOUDLY above
    MAX_BRUTE_QUERY_VECTORS instead of OOMing at corpus scale."""
    from transf_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "MAX_BRUTE_QUERY_VECTORS", 1)
    with pytest.raises(ValueError, match="documented bound"):
        sim.similarity_topk_cosine(spark, "/root/testdata/sf0.001")
