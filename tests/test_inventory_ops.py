"""P3 mention sanity, J2 antecedents, O3 approx dedup, P8/P9 guidelines,
A4 normalize, A9 training labels, S2 provenance parse, F6/F7 helpers."""

from __future__ import annotations

from stanford_relation_extractor_spark.functions.text import (
    is_valid_alternate_name,
    normalize_date_slot,
)
from stanford_relation_extractor_spark.operators.mentions import mention_sanity_ok


def test_mention_sanity_filters():
    assert not mention_sanity_ok("one", "NUMBER")
    assert not mention_sanity_ok("1234567890123456789", "NUMBER")
    assert mention_sanity_ok("34", "NUMBER")
    assert not mention_sanity_ok("Alice", "PERSON")  # single token
    assert mention_sanity_ok("Alice Person000001", "PERSON")


def test_alternate_name_validity():
    assert not is_valid_alternate_name("Acme Corp.", "Acme")  # same after stripping
    assert is_valid_alternate_name("Acme Widgets", "Acme Gadgets")


def test_date_normalization():
    assert normalize_date_slot("1997") == "1997"
    assert normalize_date_slot("1997-3") == "1997-03"
    assert normalize_date_slot("1997/03/09") == "1997-03-09"
    assert normalize_date_slot("next year") is None


def test_antecedent_propagation(spark):
    from stanford_relation_extractor_spark.operators.antecedents import (
        propagate_antecedents,
    )

    rows = [
        ("c1", 0, 0, 0, 5, "Alice Person000001", "PERSON"),
        ("c1", 1, 0, 0, 3, "She", "PRONOUN"),
        ("c1", 2, 0, 0, 6, "Org001", "ORGANIZATION"),
        ("c1", 3, 0, 0, 2, "It", "PRONOUN"),
        ("c2", 0, 0, 0, 2, "He", "PRONOUN"),  # no antecedent in this conv
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, sent_idx int, begin int, end int, surface string, ner string",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["canonical_name"]
        for r in propagate_antecedents(df).collect()
    }
    assert got[("c1", 1)] == "Alice Person000001"
    assert got[("c1", 3)] == "Org001"
    assert got[("c2", 0)] is None
    assert got[("c1", 0)] == "Alice Person000001"


def test_dedup_approximate_collapses_variants(spark):
    from stanford_relation_extractor_spark.operators.consistency import (
        dedup_approximate,
    )

    rows = [
        ("E", "PERSON", "per:employee_of", "Acme Widget", "ORGANIZATION", 2, 0.9),
        ("E", "PERSON", "per:employee_of", "Acme Widget Corp", "ORGANIZATION", 2, 0.8),
        ("E", "PERSON", "per:employee_of", "Zenith Labs", "ORGANIZATION", 2, 0.7),
    ]
    df = spark.createDataFrame(
        [r + ("c1", 0, 0) for r in rows],
        "entity_name string, entity_type string, relation string, slot_value string, "
        "slot_ner string, n_agree int, score double, conv_id string, turn_idx int, sent_idx int",
    )
    got = {r["slot_value"] for r in dedup_approximate(df).collect()}
    assert got == {"Acme Widget", "Zenith Labs"}


def test_conform_to_guidelines(spark):
    from stanford_relation_extractor_spark.operators.consistency import (
        conform_to_guidelines,
    )

    rows = [
        ("E", "PERSON", "per:title", "president", "TITLE", 2, 0.9),
        ("E", "PERSON", "per:title", "hero", "TITLE", 2, 0.9),  # invalid title
        ("O", "ORGANIZATION", "org:top_members/employees", "spokesman", "PERSON", 2, 0.9),  # invalid
        ("E", "PERSON", "per:date_of_birth", "1996", "DATE", 2, 0.9),
        ("E", "PERSON", "per:date_of_birth", "last tuesday", "DATE", 2, 0.9),  # bad shape
        ("Org007", "ORGANIZATION", "org:website", "www.org7.com", "URL", 2, 0.9),
        ("Org007", "ORGANIZATION", "org:website", "www.unrelated.com", "URL", 2, 0.9),  # unrelated
    ]
    df = spark.createDataFrame(
        [r + ("c1", 0, 0) for r in rows],
        "entity_name string, entity_type string, relation string, slot_value string, "
        "slot_ner string, n_agree int, score double, conv_id string, turn_idx int, sent_idx int",
    )
    got = {(r["relation"], r["slot_value"]) for r in conform_to_guidelines(df).collect()}
    assert got == {
        ("per:title", "president"),
        ("per:date_of_birth", "1996"),
        ("org:website", "www.org7.com"),
    }


def test_normalize_scores(spark):
    from stanford_relation_extractor_spark.operators.consistency import normalize_scores

    df = spark.createDataFrame(
        [("E", "per:age", 0.6), ("E", "per:title", 0.2), ("F", "per:age", 0.5)],
        "entity_name string, relation string, score double",
    )
    got = {
        (r["entity_name"], r["relation"]): r["score"]
        for r in normalize_scores(df, ["entity_name"]).collect()
    }
    assert got[("E", "per:age")] == 0.75
    assert got[("F", "per:age")] == 1.0


def test_training_labels(spark):
    from stanford_relation_extractor_spark.operators.statistical import training_labels

    pairs = spark.createDataFrame(
        [("E", "34"), ("E", "50"), ("E", "Org001"), ("X", "7")],
        "entity_name string, slot_value string",
    )
    kb = spark.createDataFrame(
        [("E", "per:age", "34"), ("E", "per:employee_of", "Org001")],
        "entity_name string, relation string, slot_value string",
    )
    got = {
        (r["slot_value"], r["relation"]): r["label"]
        for r in training_labels(pairs, kb).collect()
    }
    assert got[("34", "per:age")] == "positive"
    assert got[("Org001", "per:employee_of")] == "positive"
    # 50 contradicts the SINGLE-valued known age -> negative
    assert got[("50", "per:age")] == "negative"
    # employee_of is LIST -> no negative for it; X unknown -> absent
    assert ("Org001", "per:age") in got  # Org001 also contradicts age 34
    assert not any(k[0] == "7" for k in got)


def test_provenance_roundtrip(spark):
    from stanford_relation_extractor_spark.sources.provenance import (
        format_provenance,
        parse_provenance,
    )

    df = spark.createDataFrame(
        [("conv_000001:5:0:0-18:21-23",)], "provenance_str string"
    )
    parsed = parse_provenance(df).select("provenance.*")
    row = parsed.collect()[0]
    assert (row["conv_id"], row["turn_idx"], row["entity_end"], row["slot_begin"]) == (
        "conv_000001", 5, 18, 21,
    )
    back = format_provenance(parsed).collect()[0]["provenance_str"]
    assert back == "conv_000001:5:0:0-18:21-23"


def test_geo_consistency(spark):
    from stanford_relation_extractor_spark.operators.worldknowledge import (
        check_geo_consistency,
        validate_city_slots,
    )

    geo = spark.createDataFrame(
        [("NATION_2ville", "NATION_2"), ("NATION_3ville", "NATION_3")],
        "city string, country string",
    )
    triples = spark.createDataFrame(
        [
            # consistent: city maps to the accepted residence country
            ("A", "PERSON", "per:cities_of_residence", "NATION_2ville", "CITY", 2, 0.9),
            ("A", "PERSON", "per:countries_of_residence", "NATION_2", "COUNTRY", 2, 0.9),
            # contradiction: B lives in NATION_3 but city maps to NATION_2
            ("B", "PERSON", "per:cities_of_residence", "NATION_2ville", "CITY", 2, 0.9),
            ("B", "PERSON", "per:countries_of_residence", "NATION_3", "COUNTRY", 2, 0.9),
            # no country fill -> city kept
            ("C", "PERSON", "per:cities_of_residence", "NATION_3ville", "CITY", 2, 0.9),
            # unknown city -> dropped by validity, kept by consistency
            ("D", "PERSON", "per:cities_of_residence", "Atlantisville", "CITY", 2, 0.9),
        ],
        "entity_name string, entity_type string, relation string, slot_value string, "
        "slot_ner string, n_agree int, score double",
    )
    consistent = {
        (r["entity_name"], r["relation"], r["slot_value"])
        for r in check_geo_consistency(triples, geo).collect()
    }
    assert ("A", "per:cities_of_residence", "NATION_2ville") in consistent
    assert ("B", "per:cities_of_residence", "NATION_2ville") not in consistent
    assert ("C", "per:cities_of_residence", "NATION_3ville") in consistent
    assert ("D", "per:cities_of_residence", "Atlantisville") in consistent

    valid = {r["slot_value"] for r in validate_city_slots(triples, geo).collect()}
    assert "Atlantisville" not in valid
    assert "NATION_2ville" in valid
