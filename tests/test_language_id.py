"""Accuracy floor for the heuristic language-ID (rows-only query).

The synthetic fixture's lang labels are only weakly coupled to content
(word-frequency tilts; a word-unigram naive-Bayes prototype also plateaus
at ~35%), so the gate is 'solidly above 5-class chance', pinning that the
profile-join + argmax machinery keeps extracting the signal that exists —
the same role tests/test_ann_recall.py plays for the approximate ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from transf_spark.operators.text import language_id_predictions
from transf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CHANCE = 0.20  # 5 languages
FLOOR = 0.28


def test_language_id_beats_chance(spark):
    pred = language_id_predictions(spark, SF)
    truth = load_table(spark, SF, "documents").select("doc_id", "lang")
    acc = (
        pred.join(truth, "doc_id")
        .agg(F.avg((F.col("predicted_lang") == F.col("lang")).cast("double")))
        .collect()[0][0]
    )
    assert acc >= FLOOR, f"language-ID accuracy {acc:.3f} fell below {FLOOR} (chance {CHANCE})"


def test_language_id_covers_every_document(spark):
    n_docs = load_table(spark, SF, "documents").count()
    assert language_id_predictions(spark, SF).count() == n_docs


def test_bigram_extraction_guards_short_texts(spark):
    """Regression: sequence(1, length-1) is DESCENDING for length <= 1 in
    Spark, so unguarded extraction gave a 1-char doc two phantom copies of
    its single char and an empty doc three '' bigrams. The guarded
    expression must yield exactly len-1 true 2-char bigrams, zero for
    short texts."""
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab"), (4, "abc"), (5, None)],
        "doc_id long, text string",
    )
    bigrams = F.expr(
        "filter(transform(sequence(1, greatest(length(text) - 1, 1)),"
        " i -> substring(text, i, 2)), x -> length(x) = 2)"
    )
    rows = {r["doc_id"]: r["bg"] for r in df.select("doc_id", bigrams.alias("bg")).collect()}
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == ["ab"]
    assert rows[4] == ["ab", "bc"]
    # null text: greatest() skips the null length, substring(NULL,..) is
    # null, the length filter drops it — empty array, explode drops the doc
    assert rows[5] == []
