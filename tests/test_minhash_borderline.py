"""MinHash-LSH borderline-recall gate (round-2 VERDICT item #5).

The declared `dedup_fuzzy_minhash` oracle is EXACT all-pairs Jaccard, so the
LSH stage must not miss true pairs sitting right AT the 0.8 threshold — the
worst case for banded LSH recall (miss ≈ (1-j^4)^24 ≈ 3e-6 at j=0.80 for the
24×4 geometry; the round-1 16×8 geometry missed ~5% here). The driver
regenerates fixtures between rounds, so this synthesizes its own documents
with engineered shingle overlap instead of relying on whatever pairs the
current fixture happens to contain:

- pairs at j = 0.80 (exactly at threshold), 0.81 and 0.84 → MUST be found;
- a pair at j = 0.79 → must NOT be reported (verify-stage filter);
- result must hash-match the brute-force DuckDB oracle on the same parquet.

The pipeline is fully deterministic (fixed xxhash64 seeds), so a pass here is
stable across runs — this is a fixture-regeneration landmine detector, not a
statistical test.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.docfixtures import write_documents
from tests.oracle import compare
from transf_spark import queries as q


def _doc(words: list[str]) -> str:
    return " ".join(words)


def _words(prefix: str, n: int) -> list[str]:
    # all-distinct words => shingle count == len(words) - 2, no dedup effects
    return [f"{prefix}{i}" for i in range(n)]


@pytest.fixture(scope="module")
def borderline_dir(tmp_path_factory, spark):
    """Stage a documents.parquet whose pair Jaccards are engineered exactly.

    Appending m distinct words to an n-word doc adds exactly m new 3-gram
    shingles, so j(base, base+m) = (n-2) / (n-2+m).
    """
    out = str(tmp_path_factory.mktemp("minhash_borderline"))
    rows = []

    def add_pair(doc_id: int, prefix: str, shared_shingles: int, extra: int):
        base = _words(prefix, shared_shingles + 2)
        rows.append((doc_id, _doc(base), "en", "synthetic", len(_doc(base))))
        ext = base + _words(prefix + "x", extra)
        rows.append((doc_id + 1, _doc(ext), "en", "synthetic", len(_doc(ext))))

    add_pair(0, "a", 80, 20)   # j = 80/100 = 0.80 — exactly at threshold
    add_pair(10, "b", 81, 19)  # j = 81/100 = 0.81
    add_pair(20, "c", 84, 16)  # j = 84/100 = 0.84
    add_pair(30, "d", 79, 21)  # j = 79/100 = 0.79 — below threshold
    # unrelated background docs (no shared shingles with anything)
    for i in range(6):
        w = _words(f"bg{i}_", 40)
        rows.append((100 + i, _doc(w), "en", "synthetic", len(_doc(w))))

    return write_documents(out, rows)


def test_borderline_pairs_found_and_subthreshold_excluded(spark, borderline_dir):
    q.queries()  # populate the registry
    spec = q.REGISTRY["dedup_fuzzy_minhash"]
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in spec.fn(spark, borderline_dir).collect()
    }
    assert (0, 1) in got and abs(got[(0, 1)] - 0.80) < 1e-12, got
    assert (10, 11) in got and abs(got[(10, 11)] - 0.81) < 1e-12, got
    assert (20, 21) in got and abs(got[(20, 21)] - 0.84) < 1e-12, got
    assert (30, 31) not in got, "sub-threshold pair must be filtered by verify"
    assert len(got) == 3, f"unexpected extra pairs: {got}"


def test_borderline_matches_bruteforce_oracle(spark, borderline_dir):
    q.queries()  # populate the registry
    spec = q.REGISTRY["dedup_fuzzy_minhash"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{borderline_dir}/documents.parquet')"
    )
    problems = compare(spec.fn(spark, borderline_dir), con, spec.oracle)
    con.close()
    assert not problems, "; ".join(problems)


@pytest.fixture(scope="module")
def dense_borderline_dir(tmp_path_factory):
    """The near-capacity twin of borderline_dir (round-9 verdict item 3 —
    extend the beyond-exact-mode device to the minhash recall gate): the
    tiny fixture proves the geometry at 14 docs; this one proves the
    recall survives VOLUME. 50 engineered pairs exactly AT j = 0.80 (the
    banded-LSH worst case, each an independent 3e-6 miss trial), 25 pairs
    just below at j = 0.79, 20 exact-duplicate families of 5 (the
    pre-pass path), and ~950 background docs — ~1200 docs / ~630k
    representative pairs for the brute-force oracle, the top of the
    docstring's declared driver-scale range."""
    out = str(tmp_path_factory.mktemp("minhash_dense"))
    rows = []
    did = 0

    def add_pair(prefix: str, shared_shingles: int, extra: int):
        nonlocal did
        base = _words(prefix, shared_shingles + 2)
        rows.append((did, _doc(base), "en", "synthetic"))
        ext = base + _words(prefix + "x", extra)
        rows.append((did + 1, _doc(ext), "en", "synthetic"))
        did += 2

    at_threshold = []
    for k in range(50):  # j = 80/100 = 0.80 exactly
        at_threshold.append((did, did + 1))
        add_pair(f"at{k}_", 80, 20)
    below = []
    for k in range(25):  # j = 79/100 = 0.79
        below.append((did, did + 1))
        add_pair(f"lo{k}_", 79, 21)
    families = []
    for k in range(20):  # exact-duplicate family of 5
        text = _doc(_words(f"fam{k}_", 60))
        families.append(did)
        for _ in range(5):
            rows.append((did, text, "en", "synthetic"))
            did += 1
    for k in range(950):  # disjoint-vocabulary background
        w = _words(f"bg{k}_", 50)
        rows.append((did, _doc(w), "en", "synthetic"))
        did += 1
    return write_documents(out, rows), at_threshold, below, families


def test_dense_corpus_recall_and_oracle_parity(spark, dense_borderline_dir):
    """All 50 at-threshold pairs found (P[any miss] ≈ 50·3e-6), all 25
    sub-threshold pairs excluded, all 20 family stars present — and the
    whole declared output hash-matches the 630k-pair brute-force oracle."""
    d, at_threshold, below, families = dense_borderline_dir
    q.queries()  # populate the registry
    spec = q.REGISTRY["dedup_fuzzy_minhash"]
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in spec.fn(spark, d).collect()
    }
    missed = [p for p in at_threshold if p not in got]
    assert not missed, f"at-threshold pairs missed by LSH: {missed}"
    leaked = [p for p in below if p in got]
    assert not leaked, f"sub-threshold pairs leaked past verify: {leaked}"
    for rep in families:
        for member in range(rep + 1, rep + 5):
            assert (rep, member) in got and got[(rep, member)] == 1.0
    # 50 true pairs + 20 families x 4 star edges, nothing else
    assert len(got) == 50 + 20 * 4, f"unexpected pair count {len(got)}"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    try:
        problems = compare(spec.fn(spark, d), con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(problems)
