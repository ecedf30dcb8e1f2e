"""ANN quality gate (SURVEY.md §2.B `similarity_ann_lsh`): the multi-probe
LSH path is approximate by construction, so instead of a DuckDB oracle it is
judged against the exact brute-force baseline (`similarity_topk_cosine`).

The fixture embeddings are near-random (max pairwise cosine ≈ 0.5), so the
*achievable* recall for any sublinear index is low — the assertions pin the
deterministic floor (fixed data, seeded hyperplanes), not an aspiration.
"""

from __future__ import annotations

from transf_spark.queries import queries

SF = "/root/testdata/sf0.01"


def test_ann_lsh_topk_recall_vs_bruteforce(spark):
    from transf_spark.operators.similarity import ann_lsh_topk

    qs = queries()
    ann = ann_lsh_topk(spark, SF).collect()
    bf = qs["similarity_topk_cosine"](spark, SF).collect()

    bf_queries = {r["q_id"] for r in bf}
    ann_by_q: dict[int, list] = {}
    for r in ann:
        ann_by_q.setdefault(r["q_id"], []).append(r)

    # same query surface: every brute-force query answered, k rows each
    assert set(ann_by_q) == bf_queries
    for q_id, rows in ann_by_q.items():
        assert len(rows) == 10
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, 11))
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert cosines == sorted(cosines, reverse=True)

    ann_set = {(r["q_id"], r["nn_id"]) for r in ann}
    bf_set = {(r["q_id"], r["nn_id"]) for r in bf}
    recall = len(ann_set & bf_set) / len(bf_set)
    # deterministic: 0.62 on this fixture since the round-12 unioned
    # probe set (hamming<=2 fan + 3-bit flips over the query's 5 least-
    # confident planes; 0.58 round-11 flips=2, 0.30 at flips=0 with the
    # round-5 hamming-2 multi-probe, 0.08 at hamming-1); bound leaves
    # headroom for plan changes but catches a broken index (random
    # buckets at the same scanned fraction would find well under 0.3 of
    # true neighbors at TOP_K)
    assert recall >= 0.5

    # duplicate-candidate guard (LSH twin of the IVF check): redundant
    # index entries must never surface the same neighbor twice
    for q_id, rows in ann_by_q.items():
        nns = [r["nn_id"] for r in rows]
        assert len(nns) == len(set(nns)), f"duplicate nn_id in top-k of {q_id}"


def test_exact_allpairs_guard_refuses_large_corpus():
    """dedup_embedding_cosine must fail fast above the documented bound
    instead of silently planning O(n²) work (round-3 verdict item 2)."""
    import pytest

    from transf_spark.operators import similarity as s

    s._guard_exact_allpairs(s.MAX_EXACT_PAIRS_VECTORS)  # at the bound: fine
    with pytest.raises(ValueError, match="similarity_ann_lsh"):
        s._guard_exact_allpairs(s.MAX_EXACT_PAIRS_VECTORS + 1)


def test_quantize_int8_error_bound(spark):
    """Mathematical invariant of round-half-up int8 quantization: per-element
    reconstruction error is at most qscale/2 (plus float slack), codes stay
    within int8 range (|q|_1 <= 127 * dim), and the scale is nonnegative.
    Complements the DuckDB oracle (which checks equality, not meaning)."""
    from transf_spark.queries import queries

    rows = queries()["embedding_quantize_int8"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["qscale"] >= 0.0
        assert r["err_max"] <= r["qscale"] * 0.5 * (1 + 1e-12) + 1e-300
        assert 0 <= r["q_l1"] <= 127 * 64  # dim-64 fixture vectors


def test_ann_ivf_topk_recall_vs_bruteforce(spark):
    """IVF twin of the LSH gate: same query surface and output contract,
    probing IVF_PROBES of IVF_K inverted lists with IVF_ASSIGN-redundant
    corpus indexing. On this fixture the deterministic recall is 0.80
    (spherical-Lloyd-trained centroids + probes=6 + assign=2; 0.66 at
    assign=1, 0.40 untrained at 4 probes — nearest-centroid partitioning
    respects cosine geometry better than independent sign bits on
    near-random data, and corpus-side redundancy catches the boundary
    vectors query-side probing saturates on); the floor catches a broken
    index while leaving headroom (random recall ≈ 0.04)."""
    from transf_spark.operators.similarity import ann_ivf_topk

    qs = queries()
    ivf = ann_ivf_topk(spark, SF).collect()
    bf = qs["similarity_topk_cosine"](spark, SF).collect()

    bf_queries = {r["q_id"] for r in bf}
    by_q: dict[int, list] = {}
    for r in ivf:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == bf_queries
    for q_id, rows in by_q.items():
        assert len(rows) == 10
        assert sorted(r["rnk"] for r in rows) == list(range(1, 11))
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert cosines == sorted(cosines, reverse=True)

    recall = len({(r["q_id"], r["nn_id"]) for r in ivf}
                 & {(r["q_id"], r["nn_id"]) for r in bf}) / len(bf)
    assert recall >= 0.6

    # duplicate-candidate guard: redundant assignment must never surface
    # the same neighbor twice in one query's top-k
    for q_id, rows in by_q.items():
        nns = [r["nn_id"] for r in rows]
        assert len(nns) == len(set(nns)), f"duplicate nn_id in top-k of {q_id}"


def test_kmeans_inertia_monotone_and_assignment_optimal(spark):
    """Lloyd's algorithm invariants on the fixed seed: (1) total inertia is
    non-increasing across iterations (each assign step is per-point optimal,
    each recenter step is per-cluster optimal); (2) the final assignment is
    argmin over the final centroids by construction — re-deriving it from
    scratch must agree; (3) cluster count is bounded by K and every vector
    is assigned exactly once."""
    from transf_spark.operators import similarity as s

    inertias = []
    assigned = None
    for iters in (1, 2, 3):
        assigned, _, _, _ = s._kmeans(spark, SF, iters=iters)
        from pyspark.sql import functions as F

        inertias.append(assigned.agg(F.sum("d2")).first()[0])
    assert inertias[0] >= inertias[1] * (1 - 1e-12)
    assert inertias[1] >= inertias[2] * (1 - 1e-12)

    # the penultimate centroids _kmeans exposes must be EXACTLY what an
    # (iters-1)-round run finishes with — the census's inertia_prev trim
    # (round 8) is only sound if the matrices are identical
    import numpy as np

    _, _, _, (p_ids, p_cent) = s._kmeans(spark, SF, iters=3)
    _, cent2_df, _, _ = s._kmeans(spark, SF, iters=2)
    rows2 = sorted(cent2_df.collect(), key=lambda r: r["c_id"])
    i2_ids = np.array([r["c_id"] for r in rows2])
    i2_cent = np.array([list(r["cv"]) for r in rows2])
    assert np.array_equal(p_ids, i2_ids)
    assert np.array_equal(p_cent, i2_cent)

    rows = s.kmeans_cluster_profile(spark, SF).collect()
    assert 1 <= len(rows) <= s.KMEANS_K
    n = sum(r["n_vecs"] for r in rows)
    from transf_spark.sources.tables import load_table

    assert n == load_table(spark, SF, "embeddings").count()
    assert all(r["avg_d2"] >= 0 for r in rows)


def test_pca_matches_offline_numpy_and_invariants(spark):
    """The distributed moment-pass PCA must agree with an offline numpy PCA
    on the collected fixture (same covariance → same eigvecs up to the
    deterministic sign fix), components must be orthonormal, and projected
    variance must be non-increasing across components and sum to ≤ total
    variance."""
    import numpy as np

    from transf_spark.operators import similarity as s
    from transf_spark.sources.tables import load_table

    mean, comps, evr = s._pca_fit(spark, SF)
    emb = load_table(spark, SF, "embeddings").select("embedding").collect()
    x = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)

    # distributed moments == offline moments
    assert np.allclose(mean, x.mean(0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    # each component is an eigenvector: cov @ c == λ c
    lam = evr * np.maximum(np.linalg.eigvalsh(cov), 0).sum()
    for c, l in zip(comps, lam):
        assert np.allclose(cov @ c, l * c, atol=1e-8)
    # orthonormal, variance-ordered
    assert np.allclose(comps @ comps.T, np.eye(len(comps)), atol=1e-9)
    assert all(evr[i] >= evr[i + 1] - 1e-12 for i in range(len(evr) - 1))
    assert 0 < evr.sum() <= 1 + 1e-12

    # projection parity: Spark map pass == numpy projection
    rows = s.pca_projection_rows(spark, SF).collect()
    assert len(rows) == len(x)
    # declared output is flat pc0..pc7 scalars (driver canon can't hash arrays)
    by_id = {
        r["vec_id"]: np.array([r[f"pc{i}"] for i in range(s.PCA_COMPONENTS)])
        for r in rows
    }
    ids = [r["vec_id"] for r in load_table(spark, SF, "embeddings").select("vec_id").collect()]
    offline = (x - x.mean(0)) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(by_id[vid], offline[i], atol=1e-9)


def test_promoted_censuses_all_green_on_fixture(spark):
    """Round-8 census promotions: the four formerly rows-only queries now
    declare invariant censuses — on the known fixture every flag must be
    TRUE and every exact count must equal the fixture's ground truth
    (5 designated queries, 500 vectors at sf0.01)."""
    from transf_spark.sources.tables import load_table

    qs = queries()
    n_vecs = load_table(spark, SF, "embeddings").count()

    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        row = qs[name](spark, SF).collect()
        assert len(row) == 1, name
        r = row[0]
        assert r["n_queries"] == 5, name
        for flag in (
            "k_rows_bounded",
            "ranks_contiguous",
            "cosines_sorted",
            "recall_above_floor",
        ):
            assert r[flag] is True, f"{name}.{flag}"

    (km,) = qs["embedding_kmeans"](spark, SF).collect()
    assert km["n_vecs_total"] == n_vecs
    assert km["k_bounded"] is True
    assert km["assignment_optimal"] is True
    assert km["inertia_monotone"] is True

    (pca,) = qs["embedding_pca_project"](spark, SF).collect()
    assert pca["n_rows"] == n_vecs
    for flag in (
        "components_orthonormal",
        "evr_valid",
        "variance_ordered",
        "projections_centered",
    ):
        assert pca[flag] is True, flag


def test_cosine_kernel_sinks_corrupt_vectors(spark):
    """Round-6 review: a NULL/NaN vector element becomes NaN in the numpy
    kernel, and Spark orders NaN ABOVE every double — unguarded, a corrupt
    vector would take rank 1 in every top-k it touched. The kernel maps
    non-finite cosines to -inf, which sinks them below every real score
    (where the JVM fold's NULL landed under DESC ordering)."""
    from pyspark.sql import functions as F

    from transf_spark.operators.similarity import _cosine_pairs_udf

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),       # cosine 1.0
            (2, [1.0, None], [1.0, 0.0]),      # corrupt left vector
            (3, [1.0, 0.0], [float("nan"), 1.0]),  # NaN element right
            (4, [0.0, 0.0], [1.0, 0.0]),       # zero vector → 0/1 = 0.0
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = {r["id"]: r["c"] for r in df.select(
        "id", _cosine_pairs_udf()(F.col("a"), F.col("b")).alias("c")).collect()}
    assert rows[1] == 1.0
    assert rows[2] == float("-inf") and rows[3] == float("-inf")
    assert rows[4] == 0.0
    # and DESC ordering puts the corrupt rows LAST
    ordered = [r["id"] for r in df.select(
        "id", _cosine_pairs_udf()(F.col("a"), F.col("b")).alias("c"))
        .orderBy(F.col("c").desc()).collect()]
    assert set(ordered[-2:]) == {2, 3}


def test_ann_indexes_find_planted_structure(spark, tmp_path_factory):
    """Near-capacity structured corpus (round-9 verdict item 3 applied to
    the ANN gates): the sf fixtures are near-random (max cosine ~0.5), so
    their recall floors only catch a BROKEN index, not a geometrically
    misrouted one. Here 8000 vectors sit in 40 tight clusters (center +
    small deterministic perturbation), so each vector's true top-10 lives
    in its own cluster and a correctly-routing index must recover most of
    it — IVF because nearest-centroid assignment converges onto the
    planted centers, LSH because co-cluster vectors share sign patterns.
    Floors are set from the deterministic measured values (1.00 for BOTH
    on this fixture) minus headroom; a routing bug (wrong distance,
    probe set, or normalization) craters both."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from transf_spark.operators.similarity import ann_ivf_topk, ann_lsh_topk
    from transf_spark.queries import queries

    out = str(tmp_path_factory.mktemp("planted_embeddings"))
    n, dim, k_clusters = 8000, 64, 40
    # deterministic pseudo-randomness: md5 over (tag, index) — the repo's
    # standard device (Date-free, seed-free, regeneration-proof)
    def _mat(tag, rows, cols):
        out_m = np.empty((rows, cols), dtype=np.float64)
        for r in range(rows):
            h = hashlib.md5(f"{tag}:{r}".encode()).digest()
            # expand 16 bytes -> cols floats via counter-mode md5
            buf = b"".join(
                hashlib.md5(h + bytes([c])).digest() for c in range((cols * 4 + 15) // 16)
            )
            out_m[r] = (
                np.frombuffer(buf[: cols * 4], dtype="<u4").astype(np.float64)
                / 2**32
                - 0.5
            )
        return out_m

    centers = _mat("ctr", k_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    noise = _mat("nz", n, dim) * 0.05  # tight: noise << inter-center distance
    assign = np.arange(n) % k_clusters
    vecs = centers[assign] + noise
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(assign.astype(np.int32)),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    bf = queries()["similarity_topk_cosine"](spark, out).collect()
    bf_set = {(r["q_id"], r["nn_id"]) for r in bf}
    assert bf_set, "brute-force baseline must produce pairs"

    for fn, floor, name in (
        (ann_ivf_topk, 0.9, "ivf"),
        (ann_lsh_topk, 0.8, "lsh"),
    ):
        ann = fn(spark, out).collect()
        ann_set = {(r["q_id"], r["nn_id"]) for r in ann}
        # same 256-query sample surface as the brute-force baseline
        assert {q for q, _ in ann_set} == {q for q, _ in bf_set}
        recall = len(ann_set & bf_set) / len(bf_set)
        assert recall >= floor, f"{name} recall {recall:.3f} < {floor} on planted clusters"


def test_ann_census_reds_on_duplicate_neighbor_at_distinct_ranks(spark, tmp_path):
    """Round-15 ADVICE regression: the r14 pair-aggregate fold made
    ranks_contiguous blind to a DUPLICATE nn_id at two DISTINCT ranks
    (ranks still 1..k, so contiguity passed while the retired (q_id,
    nn_id) pre-aggregate failed loudly) — exactly what a duplicated
    vec_id corpus row can produce through the ROW_NUMBER top-k. The
    census must red the flag via the size(ann_ids) == k_rows conjunct,
    and stay green on the distinct-neighbor twin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from transf_spark.operators import similarity as S

    out = str(tmp_path)
    vecs = [[float((s * 7 + i) % 5 - 2) for i in range(8)] for s in range(6)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([100, 200, 1, 2, 3, 4], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0, 1, 0, 1, 0, 1], pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    def census(rows):
        ann = spark.createDataFrame(
            rows, "q_id long, nn_id long, rnk long, cosine double"
        )
        return S._ann_census(spark, out, ann, recall_floor=0.0).first()

    good = [(100, 1, 1, 0.9), (100, 2, 2, 0.8), (200, 3, 1, 0.7)]
    assert census(good)["ranks_contiguous"] is True
    # same neighbor surfaced at ranks 1 AND 2 — contiguity alone passes
    dup = [(100, 1, 1, 0.9), (100, 1, 2, 0.8), (200, 3, 1, 0.7)]
    assert census(dup)["ranks_contiguous"] is False
