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
    df = _triples(
        spark,
        [("E", "PERSON", "per:age", "34", "NUMBER", 1, 0.5),
         ("E", "PERSON", "per:age", "35", "NUMBER", 1, 0.499999)],
    )
    vals = {r["slot_value"] for r in threshold_filter(df).collect()}
    assert vals == {"34"}


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
        ("E", "PERSON", "per:age", "34", "NUMBER", 2, 0.95),
        ("E", "PERSON", "per:age", "99", "NUMBER", 1, 0.4),  # below threshold
        ("E", "PERSON", "per:title", "president", "TITLE", 2, 0.99),
    ]
    out = apply_consistency(_triples(spark, rows), spark)
    got = {(r["relation"], r["slot_value"]) for r in out.collect()}
    assert got == {("per:age", "34"), ("per:title", "president")}
