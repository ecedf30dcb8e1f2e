"""Hot-bucket safety valves (round-5 verdict item 4; reshaped in round 6).

A mass-duplicate corpus (k near-copies of one boilerplate doc) is the
scale-killer of both pair-generating dedup formulations. Three defenses,
each tested here:

- IDENTICAL copies: the sha256 exact-family pre-pass inside
  ``dedup_fuzzy_minhash`` collapses them to one representative before any
  band forms, declaring a min-rooted star at jaccard 1.0 — mirrored in
  the oracle, so this regime is parity-checkable.
- NEAR-identical-but-DISTINCT texts (boilerplate + unique ID): they
  survive the pre-pass and still share (band, band_hash) buckets; above
  ``BAND_BUCKET_CAP`` a bucket switches to a min-rooted STAR — O(k)
  candidates preserving the connected-component structure (declared
  output deviates from the brute-force oracle here BY DESIGN, so that
  path is pinned structurally, not by parity).
- n-gram Jaccard: every shingle of a family has document frequency k and
  the inverted-index join produces k²/2 rows PER SHINGLE. Shingles with
  df > ``NGRAM_DF_CAP`` are dropped from the universe in BOTH dialects
  (CCNet trick) — the family yields no pairs here by design; that regime
  belongs to dedup_exact / the minhash paths above.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.docfixtures import write_documents
from tests.oracle import compare
from transf_spark import queries as q
from transf_spark.operators.dedup import BAND_BUCKET_CAP, NGRAM_DF_CAP

N_COPIES = 1_000


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


@pytest.fixture(scope="module")
def hot_dir(tmp_path_factory):
    """documents.parquet: 1,000 identical boilerplate docs (ids 0..999),
    one engineered near-dup pair at j = 84/100 (ids 2000/2001), and
    unrelated background docs."""
    assert N_COPIES > max(BAND_BUCKET_CAP, NGRAM_DF_CAP)
    out = str(tmp_path_factory.mktemp("hot_buckets"))
    rows = []
    boiler = " ".join(_words("boiler", 40))
    for i in range(N_COPIES):
        rows.append((i, boiler, "en", "synthetic", len(boiler)))
    base = _words("p", 86)  # 84 shingles
    ext = base + _words("px", 16)  # j = 84 / (84 + 16) = 0.84
    rows.append((2000, " ".join(base), "en", "synthetic", len(" ".join(base))))
    rows.append((2001, " ".join(ext), "en", "synthetic", len(" ".join(ext))))
    for i in range(4):
        w = " ".join(_words(f"bg{i}_", 40))
        rows.append((3000 + i, w, "en", "synthetic", len(w)))

    return write_documents(out, rows)


def test_minhash_exact_family_collapses_to_mirrored_star(spark, hot_dir):
    """The 1,000 IDENTICAL copies collapse in the exact-duplicate pre-pass
    (round-6): one representative reaches the band pipeline, the family is
    declared as a min-rooted star at jaccard 1.0 — and because the oracle
    mirrors the same pre-pass, this adversarial corpus is ORACLE-PARITY
    checkable, not just structurally bounded."""
    q.queries()  # populate the registry
    spec = q.REGISTRY["dedup_fuzzy_minhash"]
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in spec.fn(spark, hot_dir).collect()
    }
    fam = {p for p in got if p[0] < N_COPIES and p[1] < N_COPIES}
    # star, not all-pairs: k-1 links, every one rooted at the min doc_id
    assert len(fam) == N_COPIES - 1, f"expected a {N_COPIES - 1}-edge star, got {len(fam)}"
    assert all(a == 0 for a, _ in fam), "star must root at the family min"
    assert {b for _, b in fam} == set(range(1, N_COPIES))
    assert all(abs(got[p] - 1.0) < 1e-12 for p in fam), "copies are identical"
    # the organic near-dup pair still resolves through the all-pairs path
    assert (2000, 2001) in got and abs(got[(2000, 2001)] - 0.84) < 1e-12
    # nothing else leaks
    assert len(got) == len(fam) + 1, f"unexpected extra pairs: {set(got) - fam}"
    # and the mirrored-pre-pass oracle agrees pair-for-pair
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hot_dir}/documents.parquet')"
    )
    problems = compare(spec.fn(spark, hot_dir), con, spec.oracle)
    con.close()
    assert not problems, "; ".join(problems)


@pytest.fixture(scope="module")
def near_dup_dir(tmp_path_factory):
    """documents.parquet with 400 NEAR-identical-but-DISTINCT texts (shared
    120-word boilerplate + one unique trailing word each, pairwise jaccard
    ≈ 0.98) — the residual regime the exact pre-pass cannot collapse and
    the BAND_BUCKET_CAP star valve exists for."""
    out = str(tmp_path_factory.mktemp("near_dup"))
    boiler = " ".join(_words("nb", 120))
    rows = []
    for i in range(400):
        t = f"{boiler} uniq{i}"
        rows.append((i, t, "en", "synthetic", len(t)))
    return write_documents(out, rows)


def test_minhash_band_valve_bounds_distinct_text_family(spark, near_dup_dir):
    """The band-bucket star valve (the second line of defense): 400
    distinct texts at pairwise jaccard ≈ 0.98 land ~92% of the family in
    ONE bucket per band (> BAND_BUCKET_CAP), so candidate volume must stay
    near-linear in the family size — NOT the 79,800 all-pairs — while the
    min-rooted star keeps every member connected to doc 0. Above the cap
    the declared output deviates from the brute-force oracle BY DESIGN
    (scale-qualified exactness), so this test pins structure, not parity."""
    q.queries()
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in q.REGISTRY["dedup_fuzzy_minhash"].fn(spark, near_dup_dir).collect()
    }
    assert got, "near-dup family must produce pairs"
    # bounded: far below all-pairs (the valve held)
    assert len(got) < 5_000, f"valve failed: {len(got)} pairs ≈ all-pairs"
    # connected: every doc reachable from the min root (directly or not)
    star_children = {b for a, b in got if a == 0}
    touched = {d for p in got for d in p}
    assert touched == set(range(400)), "valve dropped a family member"
    assert len(star_children) >= 300, "min-rooted star edges missing"
    # every surviving pair really is a near-dup
    assert all(v >= 0.8 for v in got.values())


def test_ngram_df_cap_drops_family_keeps_organic_pair(spark, hot_dir):
    q.queries()  # populate the registry
    spec = q.REGISTRY["dedup_ngram_jaccard"]
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in spec.fn(spark, hot_dir).collect()
    }
    # the hot family's shingles all carry df = 1000 > cap ⇒ zero pairs
    # (documented handoff to dedup_exact / the minhash star)
    assert got == pytest.approx({(2000, 2001): 0.84}), got
    # and the mirrored-cap oracle agrees on this adversarial corpus too
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hot_dir}/documents.parquet')"
    )
    problems = compare(spec.fn(spark, hot_dir), con, spec.oracle)
    con.close()
    assert not problems, "; ".join(problems)
