"""J2 — conversation-local antecedent propagation (coref stand-in).

The reference resolves pronouns/underspecified mentions through dcoref
+ PostIRAnnotator antecedents (`stanford-kbp/.../slotfilling/ir/
PostIRAnnotator.java:291-338`; matching at
`EntityMentionAnnotator.java:89-128`). Full dcoref is out of scope
(SURVEY.md §7 documented divergence); conversation-structured
transcripts admit a deterministic substitute: a pronoun mention adopts
the most recent preceding PERSON/ORGANIZATION mention in the same
conversation — ``last(name, ignoreNulls=True)`` over the stable
(conv_id, turn_idx, sent_idx, begin) order.

One shuffle on conv_id (shuffle-free when the table is bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRONOUNS_PERSON = ("he", "she", "they", "him", "her", "He", "She", "They")
PRONOUNS_ORG = ("it", "It")


def propagate_antecedents(mentions: DataFrame) -> DataFrame:
    """mentions(conv_id, turn_idx, sent_idx, begin, end, surface, ner
    [incl. ner='PRONOUN']) -> same rows + ``canonical_name``:
    non-pronouns keep their surface; pronouns take the nearest preceding
    PERSON (he/she/they...) or ORGANIZATION (it) surface in the
    conversation, NULL when no antecedent exists yet."""
    order = [F.col("turn_idx"), F.col("sent_idx"), F.col("begin")]
    w = (
        Window.partitionBy("conv_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_person = F.last(
        F.when(F.col("ner") == "PERSON", F.col("surface")), ignorenulls=True
    ).over(w)
    last_org = F.last(
        F.when(F.col("ner") == "ORGANIZATION", F.col("surface")), ignorenulls=True
    ).over(w)
    is_person_pron = (F.col("ner") == "PRONOUN") & F.col("surface").isin(*PRONOUNS_PERSON)
    is_org_pron = (F.col("ner") == "PRONOUN") & F.col("surface").isin(*PRONOUNS_ORG)
    return mentions.withColumn(
        "canonical_name",
        F.when(is_person_pron, last_person)
        .when(is_org_pron, last_org)
        .otherwise(F.col("surface")),
    )
