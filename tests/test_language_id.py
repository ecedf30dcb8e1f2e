"""Accuracy floor for the heuristic language-ID (rows-only query).

The synthetic fixture's lang labels are only weakly coupled to content
(word-frequency tilts; a word-unigram naive-Bayes prototype also plateaus
at ~35%), so the gate is 'solidly above 5-class chance', pinning that the
profile-join + argmax machinery keeps extracting the signal that exists —
the same role tests/test_ann_recall.py plays for the approximate ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from transf_spark.operators.text import text_language_id
from transf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CHANCE = 0.20  # 5 languages
FLOOR = 0.28


def test_language_id_beats_chance(spark):
    pred = text_language_id(spark, SF)
    truth = load_table(spark, SF, "documents").select("doc_id", "lang")
    acc = (
        pred.join(truth, "doc_id")
        .agg(F.avg((F.col("predicted_lang") == F.col("lang")).cast("double")))
        .collect()[0][0]
    )
    assert acc >= FLOOR, f"language-ID accuracy {acc:.3f} fell below {FLOOR} (chance {CHANCE})"


def test_language_id_covers_every_document(spark):
    n_docs = load_table(spark, SF, "documents").count()
    assert text_language_id(spark, SF).count() == n_docs
