"""Stage 3 — ensemble vote combination (SURVEY.md A3).

Re-expresses `stanford-kbp/.../slotfilling/classify/EnsembleRelationExtractor.java:254-336`
(noisy-or at `:293`, agreement gates at `:303-332`) as pure built-in
aggregates — no UDAF:

1. per-(group, extractor) score = max over that extractor's sentence
   votes (the at-least-once pooling of
   `OneVsAllRelationExtractor.java:82-99`);
2. per group: ``n_agree`` = #extractors voting, combined score =
   noisy-or ``1 - exp(sum(log1p(-w)))`` over per-extractor weights,
   gate per AGREE_{ANY,ALL,MOST,TWO,FIRST} (default AGREE_MOST,
   `common/Props.java:495`);
3. provenance = the argmax-weight extractor's best vote, made
   deterministic by total-order struct comparison (SURVEY.md §7: every
   window/argmax carries a total ordering key).

This is the first shuffle of the pipeline (hash agg with map-side
partial aggregation). Hot keys (celebrity entities) are handled by the
partial agg + AQE; the group key includes slot_value so key cardinality
is high and well spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GROUP_KEY = ["entity_name", "entity_type", "relation", "slot_value", "slot_ner"]

N_EXTRACTORS = 3  # pattern, trigger, window
FIRST_EXTRACTOR = "pattern"  # AGREE_FIRST's classifier[0]

AGREE_ANY = "AGREE_ANY"
AGREE_ALL = "AGREE_ALL"
AGREE_MOST = "AGREE_MOST"
AGREE_TWO = "AGREE_TWO"
AGREE_FIRST = "AGREE_FIRST"


def combine_votes(
    votes: DataFrame,
    n_extractors: int = N_EXTRACTORS,
    combination: str = AGREE_MOST,
    round_digits: int = 6,
) -> DataFrame:
    """votes -> gated, noisy-or-scored candidate triples with provenance."""
    prov = F.struct(
        (-F.col("score")).alias("neg_w"),
        F.col("conv_id"), F.col("turn_idx"), F.col("sent_idx"),
        F.col("entity_begin"), F.col("entity_end"),
        F.col("slot_begin"), F.col("slot_end"),
    )
    per_extractor = votes.groupBy(*GROUP_KEY, "extractor").agg(
        F.max("score").alias("w"),
        F.min(prov).alias("best_vote"),  # struct min = (max w, then stable position order)
    )

    agg = per_extractor.groupBy(*GROUP_KEY).agg(
        F.count("*").cast("int").alias("n_agree"),
        F.round(F.lit(1.0) - F.exp(F.sum(F.log1p(-F.col("w")))), round_digits).alias("score"),
        F.sort_array(F.collect_list("w"), asc=False).alias("ws"),
        F.max(F.when(F.col("extractor") == FIRST_EXTRACTOR, F.col("w"))).alias("first_w"),
        F.min(F.struct((-F.col("w")).alias("neg_w"), F.col("extractor"), F.col("best_vote"))).alias("best"),
    )

    top2 = F.round(
        F.lit(1.0)
        - (F.lit(1.0) - F.col("ws").getItem(0))
        * (F.lit(1.0) - F.coalesce(F.try_element_at(F.col("ws"), F.lit(2)), F.lit(0.0))),
        round_digits,
    )

    if combination == AGREE_ANY:
        gated = agg.filter(F.col("n_agree") > 0)
    elif combination == AGREE_ALL:
        gated = agg.filter(F.col("n_agree") >= n_extractors)
    elif combination == AGREE_MOST:
        # Java integer division: classifiers.size() / 2
        gated = agg.filter(F.col("n_agree") >= n_extractors // 2)
    elif combination == AGREE_TWO:
        gated = agg.filter(F.col("n_agree") >= 2).withColumn("score", top2)
    elif combination == AGREE_FIRST:
        gated = agg.filter(F.col("first_w").isNotNull()).withColumn(
            "score", F.round(F.col("first_w"), round_digits)
        )
    else:
        raise ValueError(f"unknown ensemble combination {combination!r}")

    return gated.select(
        *GROUP_KEY,
        "n_agree",
        "score",
        F.col("best.extractor").alias("provenance_extractor"),
        F.col("best.best_vote.conv_id").alias("conv_id"),
        F.col("best.best_vote.turn_idx").alias("turn_idx"),
        F.col("best.best_vote.sent_idx").alias("sent_idx"),
        F.col("best.best_vote.entity_begin").alias("entity_begin"),
        F.col("best.best_vote.entity_end").alias("entity_end"),
        F.col("best.best_vote.slot_begin").alias("slot_begin"),
        F.col("best.best_vote.slot_end").alias("slot_end"),
    )
