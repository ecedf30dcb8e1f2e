#!/usr/bin/env python
"""Scale-fixture generator (round-15 verdict item 3): write an N×-row
replica of a driver fixture's documents + embeddings tables to a NEW
directory (never the read-only /root/testdata), so the headline queries
can be measured at an ~sf1-equivalent third scale point.

Replication must preserve WORKLOAD SHAPE, not just row count:

- documents: each replica k suffixes EVERY whitespace token with the
  replica digit — cross-replica shingle/minhash/ngram identity breaks
  completely (Jaccard 0 between replicas), so the dup/near-dup cluster
  structure is the base corpus's, repeated N times, exactly how a
  proportionally larger corpus behaves. Naive verbatim tiling would
  instead create N-sized exact-dup clusters spanning replicas — the
  exact-dup pre-pass would collapse them and the measurement would
  flatter the minhash path. n_chars is recomputed (== length(text) in
  the base fixture); lang/source distributions are inherited unchanged.
- embeddings: replica k rotates each vector left by k positions —
  norm-preserving, marginal-distribution-preserving, and cross-replica
  cosines stay near-random for near-random base vectors. vec_id' =
  vec_id*N + k keeps ids dense and the designated-query fraction
  (vec_id % 100 == 0) at the base fixture's 1%.
- every other table is copied verbatim from the base dir so loaders,
  prefault, and the bench calibration scan (lineitem) keep working.

Deterministic: pure structural transforms, no RNG.

Usage: python tools/gen_scale_fixture.py [--base /root/testdata/sf0.1]
       [--out /tmp/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    assert not os.path.realpath(args.out).startswith("/root/testdata"), (
        "refusing to write into the read-only driver fixtures"
    )

    from pyspark.sql import functions as F

    from transf_spark.session import get_spark

    spark = get_spark("gen_scale_fixture")
    os.makedirs(args.out, exist_ok=True)
    n = args.factor
    reps = spark.range(n).select(F.col("id").cast("int").alias("rep"))

    docs = spark.read.parquet(f"{args.base}/documents.parquet")
    text2 = F.regexp_replace(
        F.col("text"), F.lit(r"(\S+)"), F.concat(F.lit("$1"), F.col("rep"))
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
            text2.alias("text"),
            "lang",
            "source",
            F.length(text2).cast("long").alias("n_chars"),
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(f"{args.out}/_documents_dir")
    )

    emb = spark.read.parquet(f"{args.base}/embeddings.parquet")
    rotated = F.expr(
        "CASE WHEN embedding IS NULL OR size(embedding) = 0 THEN embedding "
        "ELSE concat(slice(embedding, rep % size(embedding) + 1, "
        "size(embedding) - rep % size(embedding)), "
        "slice(embedding, 1, rep % size(embedding))) END"
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") * n + F.col("rep")).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(f"{args.out}/_embeddings_dir")
    )

    # the repo's loaders expect one <table>.parquet FILE per table — fold
    # each written directory into a single file via pyarrow
    import pyarrow.parquet as pq

    for tbl in ("documents", "embeddings"):
        d = f"{args.out}/_{tbl}_dir"
        pq.write_table(pq.read_table(d), f"{args.out}/{tbl}.parquet")
        shutil.rmtree(d)

    for f in os.listdir(args.base):
        if f.endswith(".parquet") and f not in (
            "documents.parquet",
            "embeddings.parquet",
        ):
            shutil.copy(f"{args.base}/{f}", f"{args.out}/{f}")

    for tbl in ("documents", "embeddings"):
        c = spark.read.parquet(f"{args.out}/{tbl}.parquet").count()
        print(f"{tbl}: {c} rows -> {args.out}/{tbl}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
