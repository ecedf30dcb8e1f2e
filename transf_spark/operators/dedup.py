"""Deduplication operators (north-star LLM-data-pipeline extension).

Four families, each a ``queries()`` entry with a DuckDB oracle where the
math is engine-portable:

- exact       — content-hash group-by (`dedup_exact`)
- MinHash+LSH — shingle → K seeded minhashes → banded signature → bucket
                self-join → exact-Jaccard verify (`dedup_fuzzy_minhash`)
- SimHash     — 60-bit sign-aggregated token-hash fingerprint
                (`dedup_simhash`, md5-based so the oracle can recompute it)
- n-gram Jaccard — exact all-pairs via shingle-join (`dedup_ngram_jaccard`)

Embedding-cosine near-dup lives in operators/similarity.py.

Scale notes (100 TB): every stage is expression-level (no Python); the LSH
candidate join keys on (band_id, band_hash) — high cardinality, so the
shuffle partitions evenly; exact verification runs only on LSH candidates,
never all pairs. The brute-force oracle is the *check*, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from transf_spark.queries import register
from transf_spark.sources.tables import load_table

# MinHash-LSH geometry: 24 bands × 4 rows = 96 hashes.
# The declared oracle is EXACT all-pairs Jaccard, so LSH recall must be
# near-certain at the threshold, not just at the fixture's near-dup pairs:
# with r=4, b=24 the miss probability is (1-j^4)^24 ≈ 3e-6 at j=0.80,
# 5e-9 at j=0.85, 8e-10 at j=0.89 (the lowest true pair the fixtures
# contain). The round-1 geometry (16×8) missed j=0.80 pairs ~5% of the
# time — a fixture-regeneration landmine flagged in ADVICE.md. Short bands
# admit more sub-threshold candidates, but the exact-Jaccard verify filters
# those; below-threshold candidates can never corrupt the result. 96 (not
# 128) hashes keeps the 96-buffer min-aggregate inside whole-stage codegen
# — measured 2× faster than the 128-column variant, which trips the
# generated-method size limit.
N_HASHES = 96
N_BANDS = 24
ROWS_PER_BAND = 4
JACCARD_THRESHOLD = 0.8

# Hot-bucket safety valve (round-5 verdict), SECOND line of defense: the
# exact-duplicate pre-pass inside dedup_fuzzy_minhash already collapses
# identical texts before any band forms, so this cap only fires for a
# mass family of NEAR-identical-but-distinct texts (boilerplate differing
# only in an ID/timestamp) — still one (band, band_hash) bucket, still
# k²/2 candidate pairs uncapped. Above this membership cap a bucket
# switches from all-pairs to a STAR around its min doc_id — O(k)
# candidates that preserve the connected-component structure (what
# dedup_cluster_cc consumes); the full pair list inside an oversized
# bucket is recoverable transitively. Above the cap the declared output
# therefore deviates from the brute-force oracle BY DESIGN
# (scale-qualified exactness — tests/test_dedup_hot_buckets.py pins the
# bounded star behavior structurally instead). 256 is ~20× the largest
# organic bucket either fixture produces (max 14 at sf0.1), so declared
# values are unchanged below the valve.
BAND_BUCKET_CAP = 256

def _shingle_hashes(docs: "DataFrame") -> "DataFrame":
    """(doc_id, lang, h): 64-bit hash per token-3-gram occurrence.

    The hash is computed INSIDE the transform lambda over the three words
    directly — no intermediate concat string is materialized (measured 2×
    faster than concat_ws + xxhash64 at sf0.1; shingle hashing dominates
    both MinHash and ngram-Jaccard). Words cannot contain the split
    delimiter, so triple-hash equality ≡ string-shingle equality (modulo
    64-bit collisions, same as before)."""
    w = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    return w.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                """CASE WHEN size(w) >= 3 THEN
                     transform(sequence(1, size(w) - 2),
                               i -> xxhash64(w[i-1], w[i], w[i+1]))
                   ELSE array() END"""
            )
        ).alias("h"),
    )


_SHINGLES_SQL = """
  list_distinct([string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                 || ' ' || string_split(text,' ')[i+2]
                 for i in generate_series(1, len(string_split(text,' ')) - 2)])
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT sha256(text) AS text_sha,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
    category="dedup",
    origin="EXT",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep lowest doc_id.
    At 100 TB this is the canonical one-shuffle dedup — partial aggregation
    combines map-side, and the 256-bit key makes collisions irrelevant."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2("text", 256).alias("text_sha"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "dedup_fuzzy_minhash",
    oracle=f"""
    WITH sh AS (SELECT doc_id, sha256(text) AS fp, {_SHINGLES_SQL} AS shingles
                FROM documents),
    nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
    fam AS (SELECT doc_id, fp, shingles,
                   MIN(doc_id) OVER (PARTITION BY fp) AS rep
            FROM nz),
    star AS (
      SELECT rep AS doc_id_a, doc_id AS doc_id_b, CAST(1.0 AS DOUBLE) AS jaccard
      FROM fam WHERE doc_id <> rep
    ),
    reps AS (SELECT doc_id, shingles FROM fam WHERE doc_id = rep)
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
             AS jaccard
    FROM reps a JOIN reps b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
          >= {JACCARD_THRESHOLD}
    UNION ALL
    SELECT * FROM star
    """,
    # ^ nz: drop empty-shingle docs (< 3 words) BEFORE the pair join —
    # matching the Spark side, where such docs produce no hashes and no
    # signature. Without it, a pair of two empty-shingle docs divides 0/0:
    # NULL on DuckDB 1.0 (row silently dropped, consistent by luck) but
    # NaN under ieee_floating_point_ops (DuckDB >= 1.1 default), and
    # DuckDB sorts NaN above every value so NaN >= 0.8 EMITS the pair.
    # ^ fam/star/reps mirror the Spark side's exact-duplicate pre-pass
    # (round-6 review): identical texts collapse to a min-doc_id
    # representative BEFORE any pair generation in BOTH dialects, each
    # family contributing a rep-rooted star at jaccard 1.0 — so a mass-
    # duplicate corpus no longer drives either engine quadratic, and the
    # declared output stays hash-matched in the dup-heavy regime.
    category="dedup",
    origin="EXT",
)
def dedup_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, pure DataFrame ops.

    Plan: exact-duplicate pre-pass (sha256 families collapse to a min-doc_id
    representative, each family declared as a rep-rooted star at jaccard
    1.0) → shingle-hash (map) over representatives → ONE doc_id shuffle
    carrying 96 min-aggregates AND the verify pass's distinct-hash sets
    (map-side combinable) → 24 band hashes of 4 rows each (map) → explode
    bands → per-bucket sorted-id arrays (bounded at BAND_BUCKET_CAP) →
    in-row i<j pair expansion → distinct candidate pairs → exact Jaccard
    verify ≥ 0.8 (geometry rationale at the module header: miss-prob ≈
    3e-6 at j = 0.8) → union the family stars back in.

    The oracle mirrors the SAME pre-pass and then brute-forces all
    representative pairs — feasible at driver scale (500-5000 docs); the
    LSH plan is the one that survives 100 TB (candidates ≪ n², one even
    shuffle on band hash). Jaccard itself is an exact int/int division —
    bit-identical on both engines.
    """
    # Explode + groupBy formulation: one xxhash64 per shingle (codegen'd),
    # then 96 min-aggregates over cheap affine permutations of that hash —
    # whole-stage-codegen throughout, vs ~100x slower interpreted nested
    # lambdas. One shuffle on doc_id; partial min combines map-side.
    # No array_distinct here: MinHash over a multiset == MinHash over its set
    # (duplicates never change a min), and interpreted array_distinct is the
    # single most expensive expression in the naive plan.
    docs = load_table(spark, sf_dir, "documents")
    # Exact-duplicate pre-pass (round-6 review; the round-5 verdict's own
    # scale prescription): identical texts collapse to a min-doc_id
    # representative BEFORE signatures — each family is declared as a
    # rep-rooted star at jaccard 1.0 (identical shingle sets), and the LSH
    # pipeline sees ONE row per distinct text. This is what actually
    # defuses the 10⁶-boilerplate-copies corpus: the copies never reach a
    # band bucket at all. The oracle mirrors the same fam/star/reps split,
    # so the declared output stays hash-matched in the dup-heavy regime
    # (the previous band-bucket star deviated from the brute-force oracle
    # above the cap). size(split) >= 3 is the same "has a shingle"
    # predicate as the oracle's len(shingles) > 0.
    # sha256, not md5, for the family fingerprint: equality-MERGING on a
    # collision-broken hash would silently fuse two crafted distinct docs
    # into one "identical" family (public md5 collision artifacts exist in
    # web corpora) — same standard dedup_exact already applies.
    nz = docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", F.sha2("text", 256).alias("fp"), "lang", "text"
    )
    # Family representative via groupBy(fp).agg(min) + join-back rather
    # than a partitionBy(fp) window (round-13, per the r12 verdict): the
    # window form lands EVERY copy of one duplicated text — full payload
    # — in a single task, which a 10⁸-copy boilerplate family at 100 TB
    # turns into one straggler no planner can split. The aggregate is
    # map-side combinable (copies collapse before the exchange), and the
    # join-back is a sort-merge AQE's skew-join CAN split; the price is
    # one extra small exchange (the fp->rep table), measured ~1.0x at
    # sf0.1 (3.25s window vs 3.2s join form, min-of-3 local[32]).
    fp_rep = nz.groupBy("fp").agg(F.min("doc_id").alias("rep"))
    # star rides a PROJECTED join (doc_id, fp only — guide §2.3 "project
    # before the exchange"): the star branch never reads text, so joining
    # the full nz there shuffled/broadcast every payload byte a second
    # time (round-15 measurement: part of the 2.9 s baseline).
    star = (
        nz.select("doc_id", "fp")
        .join(fp_rep, "fp")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(
            F.col("rep").alias("doc_id_a"),
            F.col("doc_id").alias("doc_id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # text rides the fp join-back exchange so shingles are computed for
    # REPRESENTATIVES ONLY — in the mass-dup regime the copies collapse
    # before the shingle explode even runs (a post-hoc shingles⋈reps join
    # instead re-shuffled the whole shingle stream; measured slower).
    reps_docs = (
        nz.join(fp_rep, "fp")
        .filter(F.col("doc_id") == F.col("rep"))
        .select("doc_id", "lang", "text")
    )
    hashed = _shingle_hashes(reps_docs).select("doc_id", "h")
    # Deterministic odd multipliers/offsets (splitmix-style constants).
    perms = [
        (0x9E3779B97F4A7C15 * (2 * k + 1) & 0x7FFFFFFFFFFFFFFF | 1,
         0xBF58476D1CE4E5B9 * (k + 1) & 0x7FFFFFFFFFFFFFFF)
        for k in range(N_HASHES)
    ]
    # F.expr strings, not nested Column ops: the 96-aggregate construction
    # is pure driver-side plan BUILD, and each nested Column costs ~7 py4j
    # round trips vs one per expr string — measured 1.92 s -> 0.08 s for
    # this list alone (the build was ~80% of the query's bench time at
    # sf0.1; the parsed JVM expressions, and therefore the plan, are
    # identical). {a}L literals fit signed long by construction (masked
    # to 63 bits), and the wrap-around multiply is the same Java long
    # multiply the Column form compiled to.
    sig_cols = [
        F.expr(f"min(h * {a}L + {b}L) AS mh{k}")
        for k, (a, b) in enumerate(perms)
    ]
    # ONE doc_id aggregate carries BOTH the 96 signature mins AND the
    # verify pass's distinct-hash set (round 15): the former separate
    # sig/sets aggregates had different partial schemas, so their
    # exchanges could not canonicalize equal and the scan + fp join +
    # shingle explode + xxhash64 pipeline executed TWICE per run. Fused,
    # both consumers hang off the same exchange and Spark's exchange
    # reuse runs the shingle pipeline ONCE (interleaved min-of-7 A/B at
    # sf0.1: 2.51 s -> 2.28 s together with the candidate-pair rewrite
    # below). collect_set partials ride the same doc_id shuffle the mins
    # already paid for.
    agg = hashed.groupBy("doc_id").agg(*sig_cols, F.collect_set("h").alias("hs"))
    sig = agg.drop("hs")
    band_cols = [
        F.expr(
            "xxhash64("
            + ", ".join(f"mh{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
            + f") AS band{j}"
        )
        for j in range(N_BANDS)
    ]
    stack_args = ", ".join(f"{j}, band{j}" for j in range(N_BANDS))
    bands = (
        sig.select("doc_id", *band_cols)
        .select("doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, band_hash)"))
    )
    # Hot-bucket valve (BAND_BUCKET_CAP): annotate every band row with its
    # bucket's size and min member via a whole-partition window — ONE
    # shuffle on the same (band, band_hash) key (the groupBy+join form
    # paid an extra aggregate exchange). Round 15 replaced the bucket
    # SELF-JOIN with a same-key groupBy + in-row pair expansion: the
    # under-cap rows collapse to a sorted id array per bucket (bounded at
    # CAP ids — never an unbounded collect; oversized buckets stream
    # their min-rooted star straight off the window rows, which spill
    # gracefully), and all i<j pairs unfold from the array in one
    # codegen'd transform. This removes the second evaluation of the
    # whole signature pipeline the join's build side paid, plus its
    # BroadcastExchange (interleaved min-of-7 A/B at sf0.1: 2.51 s ->
    # 2.28 s with the fused sig+sets aggregate; outputs hash-identical
    # at sf0.01 and sf0.1). The groupBy keys match the window's
    # partitioning, so no new exchange appears; candidate volume per
    # bucket stays bounded by max(CAP²/2, k).
    wb = W.partitionBy("band", "band_hash")
    annotated = bands.withColumn("bsz", F.count(F.lit(1)).over(wb)).withColumn(
        "bmin", F.min("doc_id").over(wb)
    )
    bucket_ids = (
        annotated.filter(F.col("bsz") <= BAND_BUCKET_CAP)
        .groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
    )
    cand_pairs = bucket_ids.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (a, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "b -> struct(a AS doc_id_a, b AS doc_id_b))))"
            )
        ).alias("p")
    ).select("p.doc_id_a", "p.doc_id_b")
    cand_star = annotated.filter(
        (F.col("bsz") > BAND_BUCKET_CAP) & (F.col("doc_id") > F.col("bmin"))
    ).select(F.col("bmin").alias("doc_id_a"), F.col("doc_id").alias("doc_id_b"))
    cand = cand_pairs.unionByName(cand_star).distinct()
    # Exact-Jaccard verify on the LSH candidates. The shingle corpus is
    # traversed exactly ONCE for the verify: each doc's distinct hash set is
    # collected per doc_id (one shuffle, map-side partial), the tiny
    # candidate-pair list is melted to (pair, role, doc_id) rows and
    # BROADCAST into that single pass, and the pair's two sets meet in a
    # ~|cand|-row aggregate where array_intersect computes |A∩B|. (Round 1
    # joined the corpus twice through per-doc count windows — two extra
    # full shuffles + sorts of every shingle.) P(a 64-bit collision perturbs
    # any Jaccard here) ≲ 1e-8; interpreted array_intersect touches only
    # candidate rows, never the corpus.
    melt = cand.select(
        "doc_id_a",
        "doc_id_b",
        F.explode(
            F.array(
                F.struct(F.col("doc_id_a").alias("doc_id"), F.lit(0).alias("role")),
                F.struct(F.col("doc_id_b").alias("doc_id"), F.lit(1).alias("role")),
            )
        ).alias("m"),
    ).select("doc_id_a", "doc_id_b", F.col("m.doc_id").alias("doc_id"), F.col("m.role").alias("role"))
    sets = agg.select("doc_id", "hs")
    # No forced broadcast on the candidate melt: its size is data-dependent
    # (a dup-heavy 100 TB corpus can produce a candidate set that would OOM a
    # forced broadcast), so AQE picks broadcast-vs-shuffle from the measured
    # runtime size — small candidate sets still get the broadcast plan.
    pair_sets = (
        sets.join(melt, "doc_id")
        .groupBy("doc_id_a", "doc_id_b")
        .agg(
            F.first(F.when(F.col("role") == 0, F.col("hs")), ignorenulls=True).alias("hs_a"),
            F.first(F.when(F.col("role") == 1, F.col("hs")), ignorenulls=True).alias("hs_b"),
        )
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jaccard = inter.cast("double") / (F.size("hs_a") + F.size("hs_b") - inter)
    return (
        pair_sets.select("doc_id_a", "doc_id_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .unionByName(star)
    )


@register(
    "dedup_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) AS hv
      FROM tok
    ),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN ((hv >> j) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM h, UNNEST(generate_series(0, 59)) AS u(j)
      GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
    category="dedup",
    origin="EXT",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document.

    Token hash = first 15 hex chars of md5 (portable across engines, unlike
    xxhash64's Spark-specific seeding). Bit j of the fingerprint is the sign
    of Σ±1 over token hashes' bit j. Computed entirely with higher-order
    functions — a map-only stage, no shuffle, which is exactly what you want
    fingerprinting 100 TB. Near-dup pairs then reduce to hamming distance
    (see tests); the oracle checks the fingerprint itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Explode distinct tokens → one md5 per token → 60 codegen'd SUM
    # aggregates (one per bit), then a flat 60-column fold into the
    # fingerprint. Round 1 computed this as nested higher-order lambdas —
    # map-only but INTERPRETED, O(60 × tokens) lambda dispatches, and ~12×
    # superlinear going sf0.01→sf0.1 (1.2s → 14.9s). This shape is one
    # shuffle whose map-side partial aggregation reduces each (partition,
    # doc) to a single 60-int row — the same whole-stage-codegen formulation
    # as dedup_fuzzy_minhash's 96 min-aggregates, and ~15× faster.
    hv = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("t"),
    ).select(
        "doc_id",
        F.expr("cast(conv(substring(md5(t), 1, 15), 16, 10) AS bigint)").alias("hv"),
    )
    # single-expr strings: one py4j round trip per column instead of three
    # (the dedup_fuzzy_minhash build-cost finding, round 14)
    bit_sums = [
        F.expr(f"sum(if(((hv >> {j}) & 1) = 1, 1, -1)) AS s{j}")
        for j in range(60)
    ]
    fingerprint = F.expr(
        " + ".join(f"if(s{j} > 0, {1 << j}L, 0L)" for j in range(60))
    )
    return (
        hv.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", fingerprint.alias("simhash"))
    )


# Shingle document-frequency cap (round-5 verdict; the CCNet trick): a
# stop-phrase 3-gram appearing in k documents produces k²/2 join rows for
# that single shingle — quadratic in the hot shingle's df, the scale-killer
# of the exact inverted-index formulation. Shingles with df > cap are
# dropped from the universe IN BOTH DIALECTS (set sizes |A|, |B| count only
# kept shingles), so the declared result stays hash-matched even if a
# regenerated fixture grows a hot shingle. Jaccard is then exact over the
# capped universe — "exact", scale-qualified. 256 is ~20× the hottest
# fixture shingle (df 14 at sf0.1): current declared values are unchanged.
# Mass-duplicate families whose every shingle exceeds the cap yield no
# pairs here by design — that regime belongs to dedup_exact /
# dedup_fuzzy_minhash's star valve.
NGRAM_DF_CAP = 256


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (SELECT doc_id, lang, {_SHINGLES_SQL} AS shingles FROM documents),
    e0 AS (SELECT doc_id, lang, unnest(shingles) AS s FROM sh),
    kept AS (
      SELECT lang, s FROM e0 GROUP BY lang, s HAVING COUNT(*) <= {NGRAM_DF_CAP}
    ),
    e AS (
      SELECT e0.doc_id, e0.lang, e0.s,
             COUNT(*) OVER (PARTITION BY e0.doc_id) AS n
      FROM e0 JOIN kept ON e0.lang = kept.lang AND e0.s = kept.s
    ),
    pair AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             any_value(a.n) AS na, any_value(b.n) AS nb
      FROM e a JOIN e b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_id_a, doc_id_b,
           CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
    FROM pair
    WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5
    """,
    category="dedup",
    origin="EXT",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard via the scalable inverted-index formulation:
    explode shingles → df-cap hot shingles (NGRAM_DF_CAP, mirrored in the
    oracle) → per-shingle member lists (bounded at cap, keyed on
    (lang, shingle) — high cardinality ⇒ even shuffle) → in-row i<j pair
    expansion → count common per pair → |A∩B| / (|A|+|B|-|A∩B|) over the
    capped universe. No n² pair enumeration — only pairs sharing ≥1 kept
    shingle materialize, and the cap bounds any one shingle's pair
    contribution at cap²/2."""
    # Distinct 64-bit shingle hashes (keys stay codegen'd longs, not
    # strings), df-cap via a whole-partition window on (lang, h) — ONE
    # shuffle on the same key the bucket groupBy below reuses.
    eh = _shingle_hashes(load_table(spark, sf_dir, "documents")).distinct()
    ehc = (
        eh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("lang", "h")))
        .filter(F.col("df") <= NGRAM_DF_CAP)
        .drop("df")
    )
    # Round 15: the former h-keyed SELF-JOIN evaluated the whole shingle
    # pipeline twice (and re-shuffled the full stream once per side onto
    # the join key) — replaced by a same-key groupBy collecting each kept
    # shingle's sorted member list (bounded at NGRAM_DF_CAP ids by the
    # filter above — never an unbounded collect) and unfolding all i<j
    # pairs in one codegen'd transform. Per-doc kept-set sizes derive
    # from the SAME bucket arrays (explode + count — no second pass over
    # documents, no doc_id window over the shingle stream); AQE
    # broadcast-joins the tiny per-doc table back onto the pair counts.
    # Interleaved min-of-7 A/B at sf0.1: 1.95 s -> 1.78 s, outputs
    # hash-identical at sf0.01/sf0.1.
    g = ehc.groupBy("lang", "h").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    n_tbl = (
        g.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        g.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "b -> struct(a AS doc_id_a, b AS doc_id_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.doc_id_a", "p.doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = n_tbl.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"))
    nb = n_tbl.select(F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb"))
    pair = pairs.join(na, "doc_id_a").join(nb, "doc_id_b")
    jaccard = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return pair.select(
        "doc_id_a", "doc_id_b", jaccard.alias("jaccard")
    ).filter(F.col("jaccard") >= 0.5)


# Edit-distance vocabulary dedup: candidate pairs come from MULTI-PASS
# token blocking (a pair is a candidate if it shares ANY word), so a
# one-word substitution ('old plate' → 'red plate') and a short typo
# ('cold ring' → 'old ring') are both inside some shared block — single-key
# blocking on just the first or last word would miss one of them.
LEV_MAX_DIST = 2


@register(
    "dedup_levenshtein_blocked",
    oracle=f"""
    WITH names AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts FROM part GROUP BY 1
    ),
    keys AS (
      SELECT p_name, UNNEST(string_split(p_name, ' ')) AS blk FROM names
    ),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM keys a JOIN keys b ON a.blk = b.blk AND a.p_name < b.p_name
    )
    SELECT c.name_a, c.name_b,
           CAST(levenshtein(c.name_a, c.name_b) AS BIGINT) AS edit_dist,
           na.n_parts AS n_parts_a, nb.n_parts AS n_parts_b
    FROM cand c
    JOIN names na ON na.p_name = c.name_a
    JOIN names nb ON nb.p_name = c.name_b
    WHERE levenshtein(c.name_a, c.name_b) <= {LEV_MAX_DIST}
    """,
    category="dedup/edit-distance",
    origin="EXT",
)
def dedup_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate detection over a string vocabulary —
    the entity-resolution shape ("same product, typo'd name") that MinHash
    can't answer (shingle Jaccard is blind to single-character edits in
    short strings). Finds all DISTINCT part-name pairs within Levenshtein
    distance LEV_MAX_DIST (= 2), with each name's row weight (how many part
    rows would merge) carried alongside.

    Plan, in three scale-bounded stages: (1) collapse the corpus to its
    name VOCABULARY with one map-side-combined shuffle — edit distance is
    a property of the string, so the 10⁹-row corpus reduces to its ≤10⁶
    distinct names before any pairing; (2) multi-pass token blocking:
    explode each name's words as block keys and equi-join on the key —
    candidates are pairs sharing ≥1 word, an even, high-cardinality
    shuffle, never an all-pairs product (the DISTINCT collapses pairs
    found under multiple shared words before the O(len²) distance runs);
    (3) ``levenshtein`` filter + AQE-broadcast joins back to the per-name
    weights. Both engines implement unit-cost Wagner-Fischer, so the
    integer distances agree exactly. A stopword-like hyper-frequent token
    would bloat one block at true scale — production blocking drops
    top-percentile tokens first; the fixture vocabulary has no such token,
    and the guard is a one-line filter on block size."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    keys = names.select(
        "p_name", F.explode(F.split("p_name", " ")).alias("blk")
    )
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.p_name") < F.col("b.p_name")))
        .select(F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b"))
        .distinct()
    )
    na = names.select(F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a"))
    nb = names.select(F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b"))
    return (
        # materialize the distance ONCE, then filter on the column —
        # filter(dist...).withColumn(dist...) plans two independent
        # levenshtein evaluations (Catalyst does no cross-operator CSE),
        # doubling the O(len²) DP per surviving candidate
        cand.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("edit_dist") <= LEV_MAX_DIST)
        .join(na, "name_a")
        .join(nb, "name_b")
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
    )
