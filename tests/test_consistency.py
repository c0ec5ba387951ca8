"""Consistency battery — mirrors HeuristicSlotfillPostProcessorsTest fixtures."""

from __future__ import annotations

from stanford_relation_extractor_spark.operators.consistency import (
    apply_consistency,
    dedup_exact,
    enforce_cardinality,
    threshold_filter,
    type_check,
)

TRIPLE_SCHEMA = (
    "entity_name string, entity_type string, relation string, slot_value string, "
    "slot_ner string, n_agree int, score double, conv_id string, turn_idx int, sent_idx int"
)


def _triples(spark, rows):
    return spark.createDataFrame(
        [r + ("c1", 0, 0) for r in rows], TRIPLE_SCHEMA
    )


def test_type_check_rejects_bad_signature(spark):
    df = _triples(
        spark,
        [
            ("E", "PERSON", "per:age", "34", "NUMBER", 2, 0.9),
            ("E", "PERSON", "per:age", "Org001", "ORGANIZATION", 2, 0.9),  # bad slot ner
            ("E", "ORGANIZATION", "per:age", "34", "NUMBER", 2, 0.9),  # bad entity type
        ],
    )
    out = type_check(df, spark).collect()
    assert len(out) == 1 and out[0]["slot_value"] == "34"


def test_threshold_is_inclusive(spark):
    # per:spouse has no per-relation floor -> global 0.5, inclusive;
    # per:age's per-relation floor (0.96) is inclusive at its boundary
    df = _triples(
        spark,
        [("E", "PERSON", "per:spouse", "S1", "PERSON", 1, 0.5),
         ("E", "PERSON", "per:spouse", "S2", "PERSON", 1, 0.499999),
         ("E", "PERSON", "per:age", "34", "NUMBER", 1, 0.96),
         ("E", "PERSON", "per:age", "35", "NUMBER", 1, 0.959999)],
    )
    vals = {r["slot_value"] for r in threshold_filter(df).collect()}
    assert vals == {"S1", "34"}


def test_single_cardinality_top1_with_tiebreak(spark):
    rows = [
        ("E", "PERSON", "per:age", "34", "NUMBER", 2, 0.95),
        ("E", "PERSON", "per:age", "50", "NUMBER", 2, 0.95),  # tie -> lexicographic slot asc
        ("E", "PERSON", "per:age", "70", "NUMBER", 2, 0.94),
        ("E", "PERSON", "per:employee_of", "Org001", "ORGANIZATION", 2, 0.9),
        ("E", "PERSON", "per:employee_of", "Org002", "ORGANIZATION", 2, 0.8),  # LIST keeps both
    ]
    df = type_check(_triples(spark, rows), spark)
    out = enforce_cardinality(df)
    ages = [r["slot_value"] for r in out.filter("relation = 'per:age'").collect()]
    assert ages == ["34"]
    emp = {r["slot_value"] for r in out.filter("relation = 'per:employee_of'").collect()}
    assert emp == {"Org001", "Org002"}


def test_dedup_exact_keeps_best_provenance(spark):
    df = spark.createDataFrame(
        [
            ("E", "PERSON", "per:age", "34", "NUMBER", 1, 0.9, "c2", 5, 0),
            ("E", "PERSON", "per:age", "34", "NUMBER", 1, 0.9, "c1", 3, 0),
        ],
        TRIPLE_SCHEMA,
    )
    out = dedup_exact(df).collect()
    assert len(out) == 1 and out[0]["conv_id"] == "c1"


def test_full_battery_composes(spark):
    rows = [
        ("E", "PERSON", "per:age", "34", "NUMBER", 2, 0.97),  # above the 0.96 floor
        ("E", "PERSON", "per:age", "99", "NUMBER", 1, 0.4),  # below threshold
        ("E", "PERSON", "per:title", "president", "TITLE", 2, 0.99),
    ]
    out = apply_consistency(_triples(spark, rows), spark)
    got = {(r["relation"], r["slot_value"]) for r in out.collect()}
    assert got == {("per:age", "34"), ("per:title", "president")}


def test_sanity_check_filters(spark):
    from stanford_relation_extractor_spark.operators.consistency import sanity_check

    rows = [
        ("E", "PERSON", "per:age", "34", "NUMBER", 1, 0.9),
        ("E", "PERSON", "per:age", "200", "NUMBER", 1, 0.9),  # >125
        ("E", "PERSON", "per:age", "3.5", "NUMBER", 1, 0.9),  # decimal
        ("O", "ORGANIZATION", "org:number_of_employees/members", "10", "NUMBER", 1, 0.9),  # <25
        ("O", "ORGANIZATION", "org:number_of_employees/members", "400", "NUMBER", 1, 0.9),
        ("X", "PERSON", "per:spouse", "X", "PERSON", 1, 0.9),  # self-fill
        ("Y", "PERSON", "per:title", "t" * 81, "TITLE", 1, 0.9),  # too long
    ]
    out = {(r["entity_name"], r["slot_value"]) for r in sanity_check(_triples(spark, rows)).collect()}
    assert out == {("E", "34"), ("O", "400")}


def test_incompatibilities_drop_lower_ranked(spark):
    from stanford_relation_extractor_spark.operators.consistency import (
        respect_incompatibilities,
    )

    rows = [
        # same (entity, slot): date_of_death is NOT declared overlapping
        # with date_of_birth -> lower (death, by relation-asc tiebreak) drops
        ("E", "PERSON", "per:date_of_birth", "1996", "DATE", 2, 0.984),
        ("E", "PERSON", "per:date_of_death", "1996", "DATE", 2, 0.984),
        # declared-overlapping pair survives together
        ("E", "PERSON", "per:country_of_birth", "NATION_2", "COUNTRY", 2, 0.9),
        ("E", "PERSON", "per:country_of_death", "NATION_2", "COUNTRY", 2, 0.8),
    ]
    out = {r["relation"] for r in respect_incompatibilities(_triples(spark, rows), spark).collect()}
    assert out == {"per:date_of_birth", "per:country_of_birth", "per:country_of_death"}


def test_mitigate_loc_of_death(spark):
    from stanford_relation_extractor_spark.operators.consistency import mitigate_loc_of_death

    rows = [
        ("A", "PERSON", "per:country_of_death", "NATION_2", "COUNTRY", 2, 0.9),
        ("A", "PERSON", "per:date_of_death", "1996", "DATE", 2, 0.9),
        ("B", "PERSON", "per:country_of_death", "NATION_3", "COUNTRY", 2, 0.9),  # no date
        ("B", "PERSON", "per:age", "30", "NUMBER", 2, 0.9),
    ]
    out = {(r["entity_name"], r["relation"]) for r in mitigate_loc_of_death(_triples(spark, rows)).collect()}
    assert ("A", "per:country_of_death") in out
    assert ("B", "per:country_of_death") not in out
    assert ("B", "per:age") in out


def test_collapse_employee_member(spark):
    from stanford_relation_extractor_spark.operators.consistency import (
        collapse_employee_member,
    )

    rows = [
        ("E", "PERSON", "per:employee_of", "Org001", "ORGANIZATION", 2, 0.9),
        ("E", "PERSON", "per:member_of", "Org001", "ORGANIZATION", 2, 0.8),
        ("E", "PERSON", "per:member_of", "Org002", "ORGANIZATION", 2, 0.7),
    ]
    out = {(r["relation"], r["slot_value"]) for r in collapse_employee_member(_triples(spark, rows)).collect()}
    assert out == {("per:employee_of", "Org001"), ("per:member_of", "Org002")}


def test_cooccurrence_matrix_semantics():
    from stanford_relation_extractor_spark.ontology import plausibly_cooccurs

    # declared both-direction pairs
    assert plausibly_cooccurs("per:country_of_birth", "per:country_of_death")
    assert plausibly_cooccurs("per:employee_of", "per:schools_attended")
    # missing key on either side -> never co-occurs (RelationType.java:228-230)
    assert not plausibly_cooccurs("per:date_of_birth", "per:date_of_death")
    assert not plausibly_cooccurs("org:founded_by", "org:top_members/employees")


def test_greedy_consistency_matches_battery_on_corpus(spark):
    """W1 greedy (applyInPandas) vs the join/window battery: identical
    surviving triple sets on the synthetic corpus."""
    from pyspark.sql import functions as F

    from stanford_relation_extractor_spark.operators.consistency import (
        conform_to_guidelines,
        greedy_consistency,
        type_check,
        threshold_filter,
        sanity_check,
    )
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    stages = build_stages(spark, "/root/testdata/sf0.001")
    cand = stages["candidates"].unionByName(
        stages["alt_names"], allowMissingColumns=True
    )
    pre = threshold_filter(
        conform_to_guidelines(sanity_check(type_check(cand, spark)))
    ).drop("cardinality")
    greedy = greedy_consistency(pre)
    battery = stages["triples"]
    key = ["entity_name", "entity_type", "relation", "slot_value"]
    g = {tuple(r) for r in greedy.select(*key).collect()}
    b = {tuple(r) for r in battery.select(*key).collect()}
    assert g == b
