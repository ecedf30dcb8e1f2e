"""Unicode parity sweep (round-8 fifth family, after the NULL/degenerate
sweeps of round 6): multilingual text is the NORM for an LLM-corpus
engine, and none of the existing edge fixtures leaves ASCII. The classes
this fixture is engineered to expose, should either engine diverge:

- code-point vs grapheme vs byte length (astral emoji are 1 code point /
  4 UTF-8 bytes / 2 UTF-16 units; combining sequences are 2 code points
  rendering as 1 grapheme);
- case-mapping locale hazards (Turkish dotted/dotless i, German ß);
- whitespace classes beyond ASCII (U+3000 ideographic space — Java \\s
  vs RE2 \\s disagree on some controls already, round-6 finding);
- regex char classes over non-Latin scripts;
- hashing/fingerprinting over multi-byte UTF-8 (md5/xxhash operate on
  bytes — identical — but any upstream normalization difference would
  surface as a hash mismatch here).

Every documents-family oracle query runs against the fixture with the
driver's own comparator, exactly like the round-6 sweeps.
"""

from __future__ import annotations

import pytest

from tests.docfixtures import write_documents
from tests.oracle import compare
from tests.test_round6_edges import EDGE_QUERIES, _con
from transf_spark.queries import all_specs


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("unicode_docs"))
    rows = [
        (1, "héllo wörld héllo wörld again", "de", "srcU"),  # precomposed
        # combining acute (U+0301): 2 code points per é-grapheme
        (2, "étude étude encore étude", "fr", "srcU"),
        (3, "日本語 テキスト 処理 日本語 処理", "ja", "srcU"),  # CJK + katakana
        (4, "🎉 party 🎉 time 🚀 launch", "en", "srcU"),  # astral plane
        (5, "İstanbul ısı STRASSE ß word", "tr", "srcU"),  # case hazards
        (6, "mixed　ideographic　space words", "en", "srcU"),
        (7, "普通 ascii mix 普通 words here", "zh", "srcU"),
        (8, "plain ascii control row words", "en", "srcA"),
        (9, "ελληνικά κείμενο δοκιμή ελληνικά", "el", "srcU"),  # Greek
        (10, "русский текст тест русский", "ru", "srcU"),  # Cyrillic
    ]
    return write_documents(out, rows)


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_docs_queries_survive_unicode(spark, unicode_dir, name):
    """Same harness as the round-6 degenerate sweep: every documents-only
    oracle query must hash-match DuckDB on the multilingual fixture."""
    spec = all_specs()[name]
    con = _con(unicode_dir)
    try:
        problems = compare(spec.fn(spark, unicode_dir), con, spec.oracle)
    finally:
        con.close()
    assert not problems, "; ".join(str(p) for p in problems)


def test_unicode_length_semantics_pinned(spark, unicode_dir):
    """Pin the cross-engine length contract the sweep relies on: both
    engines count CODE POINTS (emoji = 1, combining sequence = its code
    points, CJK = 1 each) — if either ever switches to graphemes or
    UTF-16 units, this fails before a subtle hash mismatch does."""
    from pyspark.sql import functions as F

    from transf_spark.sources.tables import load_table

    docs = load_table(spark, unicode_dir, "documents")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.length("text").alias("n")).collect()
    }
    con = _con(unicode_dir)
    try:
        duck = dict(con.execute("SELECT doc_id, length(text) FROM documents").fetchall())
    finally:
        con.close()
    assert got == {k: int(v) for k, v in duck.items()}
    # and the fixture's n_chars (Python len = code points) agrees too
    nch = {
        r["doc_id"]: r["n_chars"]
        for r in docs.select("doc_id", "n_chars").collect()
    }
    assert got == nch
