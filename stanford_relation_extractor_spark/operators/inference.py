"""Inferential slot filling — the second (rule-inference) pipeline of
`stanford-kbp/.../slotfilling/evaluate/InferentialSlotFiller.java:1-406`
and the `evaluate/inference/` package (BayesNet / SimpleGraphInference),
re-expressed as deterministic relational rules over the materialized
triple store (each rule is one join/projection — no engine needed):

* symmetry:       per:spouse(a, b)            => per:spouse(b, a)
* inversion:      org:top_members/employees(o, p) => per:employee_of(p, o)
* geo lifting:    per:cities_of_residence(p, c) + gazetteer(c -> country)
                  => per:countries_of_residence(p, country)
                  (and city_of_birth/death -> country_of_birth/death)

Scores decay by a per-rule confidence (the BayesNet edge-probability
analog); provenance carries the rule id. ``infer_triples`` emits ONLY
novel fills (anti-join against the input), so IntersectSlotFiller (O5)
has a genuine second pipeline to intersect/union with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULE_CONFIDENCE = 0.9

CITY_LIFT = {
    "per:cities_of_residence": "per:countries_of_residence",
    "per:city_of_birth": "per:country_of_birth",
    "per:city_of_death": "per:country_of_death",
    "org:city_of_headquarters": "org:country_of_headquarters",
}

_OUT_COLS = [
    "entity_name", "entity_type", "relation", "slot_value", "slot_ner",
    "score", "rule",
]


def _symmetric_spouse(triples: DataFrame) -> DataFrame:
    return triples.filter(
        (F.col("relation") == "per:spouse") & (F.col("slot_ner") == "PERSON")
    ).select(
        F.col("slot_value").alias("entity_name"),
        F.lit("PERSON").alias("entity_type"),
        F.lit("per:spouse").alias("relation"),
        F.col("entity_name").alias("slot_value"),
        F.lit("PERSON").alias("slot_ner"),
        F.round(F.col("score") * RULE_CONFIDENCE, 6).alias("score"),
        F.lit("spouse_symmetry").alias("rule"),
    )


def _invert_top_members(triples: DataFrame) -> DataFrame:
    return triples.filter(
        (F.col("relation") == "org:top_members/employees")
        & (F.col("slot_ner") == "PERSON")
    ).select(
        F.col("slot_value").alias("entity_name"),
        F.lit("PERSON").alias("entity_type"),
        F.lit("per:employee_of").alias("relation"),
        F.col("entity_name").alias("slot_value"),
        F.lit("ORGANIZATION").alias("slot_ner"),
        F.round(F.col("score") * RULE_CONFIDENCE, 6).alias("score"),
        F.lit("top_members_inversion").alias("rule"),
    )


def _lift_city_to_country(triples: DataFrame, geo_cities: DataFrame) -> DataFrame:
    lift = F.create_map(
        *[x for k, v in sorted(CITY_LIFT.items()) for x in (F.lit(k), F.lit(v))]
    )
    cities = triples.filter(F.col("relation").isin(*CITY_LIFT)).join(
        F.broadcast(
            geo_cities.select(F.col("city").alias("_city"), F.col("country").alias("_country"))
        ),
        F.col("slot_value") == F.col("_city"),
    )
    return cities.select(
        "entity_name",
        "entity_type",
        lift.getItem(F.col("relation")).alias("relation"),
        F.col("_country").alias("slot_value"),
        F.lit("COUNTRY").alias("slot_ner"),
        F.round(F.col("score") * RULE_CONFIDENCE, 6).alias("score"),
        F.lit("geo_lift").alias("rule"),
    )


def infer_triples(triples: DataFrame, geo_cities: DataFrame) -> DataFrame:
    """All rule conclusions NOT already present in the input store —
    one W4-deterministic row per novel (entity, relation, slot)."""
    from pyspark.sql import Window

    raw = (
        _symmetric_spouse(triples)
        .unionByName(_invert_top_members(triples))
        .unionByName(_lift_city_to_country(triples, geo_cities))
    )
    key = ["entity_name", "entity_type", "relation", "slot_value"]
    novel = raw.join(triples.select(*key).distinct(), key, "left_anti")
    w = Window.partitionBy(*key).orderBy(F.desc("score"), F.asc("rule"))
    return (
        novel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(*_OUT_COLS)
    )


def intersect_with_inferred(
    triples: DataFrame, inferred: DataFrame
) -> DataFrame:
    """O5 IntersectSlotFiller over SIMPLE x INFERENTIAL: fills the
    inference rules independently corroborate (here: derivable both
    ways)."""
    from .evaluate import intersect_triples

    return intersect_triples(triples, inferred)
