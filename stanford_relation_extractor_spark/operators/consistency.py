"""Stage 6 — consistency filter/rewrite battery (SURVEY.md §2b/§2e/§2f).

The reference applies ordered rewrites-then-filters
(`stanford-kbp/.../slotfilling/evaluate/SlotfillPostProcessor.java:83-190`,
`HeuristicSlotfillPostProcessors.java`). Re-expressed as window + join
passes, ordered cheap-before-expensive so Catalyst keeps predicates
early:

* P6  RespectRelationTypes (`HeuristicSlotfillPostProcessors.java:47-89`)
  — broadcast join against the relation-schema dimension.
* P7  FilterVeryLowProbabilitySlots (`:139-147`, threshold
  `common/Props.java:480`) — score >= 0.5.
* O2  NoDuplicates (`:655-670`) — exact triple dedup.
* W2  single-value top-1 (`:742-756`) — cardinality-gated
  row_number window.
* W4  deterministic tie-breaking (`common/KBPSlotFill.java:69-91`) —
  score desc, slot token count desc, slot length desc, slot value asc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ontology import GLOBAL_SCORE_THRESHOLD, relation_schema_df


def type_check(triples: DataFrame, spark: SparkSession) -> DataFrame:
    """P6: keep triples whose (entity_type, slot_ner) fit the relation."""
    schema = F.broadcast(
        relation_schema_df(spark).select(
            "relation",
            F.col("entity_type").alias("rs_entity_type"),
            "cardinality",
            "valid_slot_ners",
        )
    )
    return (
        triples.join(schema, "relation")
        .filter(
            (F.col("entity_type") == F.col("rs_entity_type"))
            & F.array_contains(F.col("valid_slot_ners"), F.col("slot_ner"))
        )
        .drop("rs_entity_type", "valid_slot_ners")
    )


def threshold_filter(triples: DataFrame, threshold: float = GLOBAL_SCORE_THRESHOLD) -> DataFrame:
    """P7: drop slots scored below the global threshold."""
    return triples.filter(F.col("score") >= F.lit(threshold))


def dedup_exact(triples: DataFrame) -> DataFrame:
    """O2: one row per (entity, relation, slot) — keep deterministic best."""
    w = Window.partitionBy("entity_name", "entity_type", "relation", "slot_value").orderBy(
        F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"), F.asc("sent_idx")
    )
    return (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def tiebreak_order() -> list:
    """W4 total order within (entity, relation) partitions."""
    slot_tokens = F.size(F.split(F.col("slot_value"), " "))
    return [
        F.desc("score"),
        slot_tokens.desc(),
        F.length("slot_value").desc(),
        F.asc("slot_value"),
    ]


def enforce_cardinality(triples: DataFrame) -> DataFrame:
    """W2: SINGLE-cardinality relations keep only the top-1 fill.

    Requires a ``cardinality`` column (added by ``type_check``).
    """
    w = Window.partitionBy("entity_name", "entity_type", "relation").orderBy(*tiebreak_order())
    return (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("cardinality") == "LIST") | (F.col("_rn") == 1))
        .drop("_rn")
    )


def apply_consistency(
    triples: DataFrame, spark: SparkSession, threshold: float = GLOBAL_SCORE_THRESHOLD
) -> DataFrame:
    """The full stage-6 battery in reference order (filters before windows)."""
    out = type_check(triples, spark)
    out = threshold_filter(out, threshold)
    out = dedup_exact(out)
    out = enforce_cardinality(out)
    return out.drop("cardinality")
