"""Round-16: lazy-plan memo for the similarity module's shared input
subtrees (_emb_double / _bucketed — the load_table _PLAN_CACHE device).
One similarity_ann_lsh plan build measured ~0.95 s of py4j round trips,
a third of the query's bench time; the memo returns the SAME lazy plan
for identical (session, fixture fingerprint, args). These pin the memo's
contract: identity on repeat, invalidation on fixture regeneration, and
plans-not-results (every action re-scans parquet)."""

from __future__ import annotations

import os
import shutil

from transf_spark.operators.similarity import _bucketed, _emb_double

SF = "/root/testdata/sf0.001"


def test_memo_returns_identical_plan(spark):
    assert _emb_double(spark, SF, uniform=True) is _emb_double(
        spark, SF, uniform=True
    )
    assert _bucketed(spark, SF, flips=2) is _bucketed(spark, SF, flips=2)
    # distinct args are distinct cache entries
    assert _emb_double(spark, SF, uniform=False) is not _emb_double(
        spark, SF, uniform=True
    )
    assert _bucketed(spark, SF) is not _bucketed(spark, SF, with_margins=True)


def test_memo_invalidates_on_fixture_regeneration(spark, tmp_path):
    d = str(tmp_path / "fx")
    os.makedirs(d)
    for t in ("embeddings", "documents"):
        shutil.copy(f"{SF}/{t}.parquet", f"{d}/{t}.parquet")
    a = _emb_double(spark, d, uniform=True)
    n_a = a.count()  # plans, not results: this scans the parquet
    # in-place regeneration: new mtime_ns -> new staging_tag -> rebuild
    os.utime(f"{d}/embeddings.parquet")
    b = _emb_double(spark, d, uniform=True)
    assert a is not b, "regenerated fixture must not serve the stale plan"
    assert b.count() == n_a


def test_memoized_subtrees_self_join_cleanly(spark):
    """The census joins two frames derived from the SAME memoized subtree
    (bucketed ⋈ probes) — DeduplicateRelations must keep resolving it."""
    from pyspark.sql import functions as F

    b = _bucketed(spark, SF, flips=2)
    p = _bucketed(spark, SF, with_margins=True).select(
        F.col("vec_id").alias("q_id"), "bucket"
    )
    joined = b.join(p, "bucket")
    assert joined.count() >= 0  # resolution is the assertion
