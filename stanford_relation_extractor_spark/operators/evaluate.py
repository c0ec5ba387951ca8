"""Evaluation operators (SURVEY.md A10, S10, O5).

* ``pr_score`` — P/R/F1 of guessed triples vs a gold set with
  equivalence classes, the join+count re-expression of
  `stanford-kbp/.../slotfilling/evaluate/GoldResponseSet.java:880-886` /
  `KBPScore.java:21-68`: a guess is correct if it matches the gold
  (query, relation) and its slot falls in a gold equivalence class;
  recall counts distinct gold equivalence classes hit.
* ``nil_padded_output`` — the OfficialOutputWriter's NIL rows
  (`spec/OfficialOutputWriter.java:47-113`): every (query, relation)
  with no surviving fill emits a NIL marker, via a left anti join
  against the full query x relation grid.
* ``intersect_triples`` — IntersectSlotFiller (O5): triples agreed on
  by two independent pipeline outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ontology import RELATIONS


def pr_score(guesses: DataFrame, gold: DataFrame) -> DataFrame:
    """One-row DataFrame (n_guessed, n_gold_classes, n_correct, precision, recall, f1).

    ``guesses``: (entity_name, relation, slot_value).
    ``gold``: (entity_name, relation, slot_value, equiv_class) — multiple
    slot surfaces may share an equiv_class (GoldResponseSet semantics).
    """
    g = guesses.select("entity_name", "relation", "slot_value").distinct()
    matches = g.join(gold, ["entity_name", "relation", "slot_value"], "inner")
    n_correct = matches.count()
    n_classes_hit = (
        matches.select("entity_name", "relation", "equiv_class").distinct().count()
    )
    n_guessed = g.count()
    n_gold = gold.select("entity_name", "relation", "equiv_class").distinct().count()
    precision = n_correct / n_guessed if n_guessed else 0.0
    recall = n_classes_hit / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    spark = guesses.sparkSession
    return spark.createDataFrame(
        [(n_guessed, n_gold, n_correct, round(precision, 6), round(recall, 6), round(f1, 6))],
        "n_guessed long, n_gold_classes long, n_correct long, precision double, recall double, f1 double",
    )


def nil_padded_output(triples: DataFrame, queries: DataFrame, spark: SparkSession) -> DataFrame:
    """Sorted official output with NIL padding (S10).

    ``queries``: (query_id, entity_name, entity_type). Output one row per
    (query, relation in the entity's ontology half); missing fills carry
    slot_value = 'NIL'.
    """
    rels = spark.createDataFrame(
        [(r.name, r.entity_type) for r in RELATIONS], "relation string, rel_entity_type string"
    )
    grid = queries.join(
        F.broadcast(rels), queries["entity_type"] == rels["rel_entity_type"]
    ).select("query_id", "entity_name", "entity_type", "relation")
    filled = grid.join(
        triples.select("entity_name", "entity_type", "relation", "slot_value", "score"),
        ["entity_name", "entity_type", "relation"],
        "left",
    )
    return filled.select(
        "query_id",
        "entity_name",
        "relation",
        F.coalesce(F.col("slot_value"), F.lit("NIL")).alias("slot_value"),
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
    ).orderBy("query_id", "relation", F.desc("score"), "slot_value")


def intersect_triples(a: DataFrame, b: DataFrame) -> DataFrame:
    """O5: fills proposed by both pipelines (key equality on the triple)."""
    key = ["entity_name", "entity_type", "relation", "slot_value"]
    return a.join(b.select(*key).distinct(), key, "left_semi")
