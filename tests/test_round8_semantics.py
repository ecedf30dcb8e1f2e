"""Hand-computed semantic expectations for the round-8 additions.

Oracle parity proves Spark and DuckDB agree; these prove the AGREED answer
is the RIGHT one — a shared definition mistake (wrong churn attribution,
inverted weight ratio, bitmap word collision) would pass parity in both
dialects and only fail here, against expectations computed by hand.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from transf_spark.queries import REGISTRY, queries

_D0 = dt.datetime(2024, 1, 1)


def _write_events(out: str, rows) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))
    return out


@pytest.fixture(scope="module")
def lifecycle_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lifecycle"))
    day = lambda n, h=9: _D0 + dt.timedelta(days=n - 1, hours=h)  # noqa: E731
    rows = [
        # user 1 active days 1, 2, 4 (two events on day 1 — dedup check)
        (1, day(1), 1, "view", 1.0, "{}"),
        (2, day(1, 15), 1, "click", 1.0, "{}"),
        (3, day(2), 1, "view", 1.0, "{}"),
        (4, day(4), 1, "view", 1.0, "{}"),
        # user 2 active day 2 only
        (5, day(2), 2, "view", 1.0, "{}"),
    ]
    return _write_events(out, rows)


def test_lifecycle_hand_computed(spark, lifecycle_dir):
    """u1: d1 new, d2 retained, gap, d4 resurrected, churn on d3 and d5;
    u2: d2 new, churn on d3. Every active day eventually churns or
    retains; churn past the last observed day is emitted."""
    queries()
    got = {
        r["day"].isoformat(): (
            r["n_new"],
            r["n_retained"],
            r["n_resurrected"],
            r["n_churned"],
        )
        for r in REGISTRY["events_user_lifecycle"].fn(spark, lifecycle_dir).collect()
    }
    assert got == {
        "2024-01-01": (1, 0, 0, 0),
        "2024-01-02": (1, 1, 0, 0),
        "2024-01-03": (0, 0, 0, 2),  # u1 gap-churn + u2 end-churn
        "2024-01-04": (0, 0, 1, 0),  # u1 resurrects
        "2024-01-05": (0, 0, 0, 1),  # u1 end-churn
    }


@pytest.fixture(scope="module")
def mixture_dir(tmp_path_factory):
    from tests.docfixtures import write_documents

    out = str(tmp_path_factory.mktemp("mixture"))
    rows = [
        # (doc_id, text, lang, source): group A = 3 docs, group B = 1 doc
        (1, "alpha beta", "en", "srcA"),
        (2, "gamma delta", "en", "srcA"),
        (3, "epsilon zeta", "en", "srcA"),
        (4, "eta theta", "de", "srcB"),
    ]
    return write_documents(out, rows)


def test_mixture_weights_hand_computed(spark, mixture_dir):
    """Uniform target over 2 groups of 4 docs: weight_A = 4/(2·3) = 2/3
    (keep_bp 6666 — floor, not round), weight_B = 4/(2·1) = 2 → capped at
    keep 1.0, so the singleton group keeps its doc with certainty."""
    queries()
    rows = {
        (r["lang"], r["source"]): r
        for r in REGISTRY["docs_mixture_reweight"].fn(spark, mixture_dir).collect()
    }
    a, b = rows[("en", "srcA")], rows[("de", "srcB")]
    assert a["n_docs"] == 3 and b["n_docs"] == 1
    assert abs(a["weight"] - 4.0 / 6.0) < 1e-15
    assert b["weight"] == 2.0
    assert a["keep_bp"] == 6666  # floor(0.666... * 10000)
    assert b["keep_bp"] == 10000
    assert b["n_kept"] == 1  # keep probability 1.0 is certainty, not a draw
    assert 0 <= a["n_kept"] <= 3


@pytest.fixture(scope="module")
def bitmap_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bitmap"))
    ts = _D0
    # ids straddle word boundaries (63|64, 127|128), repeat within a
    # segment (64 twice in "a"), collide across segments (0 in both), and
    # include a negative id (floor-division word, not truncation)
    rows = [
        (1, ts, 0, "a", 1.0, "{}"),
        (2, ts, 63, "a", 1.0, "{}"),
        (3, ts, 64, "a", 1.0, "{}"),
        (4, ts, 64, "a", 1.0, "{}"),
        (5, ts, 127, "a", 1.0, "{}"),
        (6, ts, 128, "b", 1.0, "{}"),
        (7, ts, 0, "b", 1.0, "{}"),
        (8, ts, -1, "b", 1.0, "{}"),
        (9, ts, None, "c", 1.0, "{}"),  # NULL-only segment → 0 users
    ]
    return _write_events(out, rows)


def test_bitmap_distinct_hand_computed(spark, bitmap_dir):
    queries()
    got = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["agg_bitmap_distinct_segments"].fn(spark, bitmap_dir).collect()
    }
    assert got == {"a": 4, "b": 3, "c": 0}


def test_jsonl_corrupt_rows_keep_their_language(spark):
    """The PERMISSIVE reader must preserve the parseable columns of a
    corrupt row: every corrupt row still groups under its real language
    (n_corrupt distributes by lang), and corrupt rows carry a NULL
    n_chars (quarantined, not silently coerced)."""
    from transf_spark.sources.formats import _staged_corrupt_jsonl

    queries()
    sf = "/root/testdata/sf0.01"
    src = _staged_corrupt_jsonl(spark, sf)
    from pyspark.sql import functions as F

    # cache() before filtering on _corrupt_record: Spark's documented
    # semantics — a pruned scan re-parses only the referenced columns, and
    # a filter-only reference to the corrupt column reads nothing to fail
    # on, so the filter sees NULLs (the census query is immune: its single
    # aggregate references the data columns AND the corrupt column in one
    # pass). This is exactly the quarantine-workflow gotcha the docstring
    # warns about, exercised here on purpose.
    df = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(f"{src}/data")
        .cache()
    )
    corrupt = df.filter(F.col("_corrupt_record").isNotNull())
    assert corrupt.filter(F.col("lang").isNull()).count() == 0
    assert corrupt.filter(F.col("n_chars").isNotNull()).count() == 0
    # and the census query's totals agree with a direct recount
    census = {
        r["lang"]: r["n_corrupt"]
        for r in REGISTRY["scan_jsonl_corrupt_tolerant"].fn(spark, sf).collect()
    }
    direct = {
        r["lang"]: r["n"]
        for r in corrupt.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {k: v for k, v in census.items() if v} == direct
    df.unpersist()


def test_ann_census_with_zero_designated_queries(spark, tmp_path):
    """A fixture whose vec_ids are all non-multiples of 100 has NO
    designated query vectors — a legitimate degenerate regeneration. The
    censuses must emit n_queries = 0 with vacuously-TRUE flags (matching
    the oracle's literal row), never NULL flags from empty aggregates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path)
    vecs = [[float((s * 7 + i) % 5 - 2) for i in range(8)] for s in range(3)]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0, 1, 0], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    queries()
    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        (row,) = REGISTRY[name].fn(spark, out).collect()
        assert row["n_queries"] == 0, name
        for flag in (
            "k_rows_bounded",
            "ranks_contiguous",
            "cosines_sorted",
            "recall_above_floor",
        ):
            assert row[flag] is True, f"{name}.{flag}"


def test_promoted_censuses_with_all_null_embeddings(spark, tmp_path):
    """A fixture whose embeddings are ALL NULL has zero valid vectors — a
    legitimate degenerate regeneration. Every promoted census must emit its
    count = 0 with vacuously-TRUE flags (matching the oracle's literal
    row), and no kernel may crash training/fitting on the empty corpus
    (round-9 advisory: the r8 zero-designated-queries fix covered the ANN
    twins but not the kmeans/PCA promotions)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path)
    tbl = pa.table(
        {
            "vec_id": pa.array([100, 200, 300], pa.int64()),
            "embedding": pa.array([None, None, None], pa.list_(pa.float32())),
            "label": pa.array([0, 1, 0], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    queries()
    expected = {
        "similarity_ann_lsh": (
            "n_queries",
            ["k_rows_bounded", "ranks_contiguous", "cosines_sorted",
             "recall_above_floor"],
        ),
        "similarity_ann_ivf": (
            "n_queries",
            ["k_rows_bounded", "ranks_contiguous", "cosines_sorted",
             "recall_above_floor"],
        ),
        "embedding_kmeans": (
            "n_vecs_total",
            ["k_bounded", "assignment_optimal", "inertia_monotone"],
        ),
        "embedding_pca_project": (
            "n_rows",
            ["components_orthonormal", "evr_valid", "variance_ordered",
             "projections_centered"],
        ),
    }
    for name, (count_col, flags) in expected.items():
        (row,) = REGISTRY[name].fn(spark, out).collect()
        assert row[count_col] == 0, name
        for flag in flags:
            assert row[flag] is True, f"{name}.{flag}"
    # the per-row surfaces are empty, never crashing
    from transf_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        kmeans_cluster_profile,
        pca_projection_rows,
    )

    for fn in (ann_lsh_topk, ann_ivf_topk, kmeans_cluster_profile,
               pca_projection_rows):
        assert fn(spark, out).count() == 0, fn.__name__
