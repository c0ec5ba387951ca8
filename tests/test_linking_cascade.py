"""J8 same-entity cascade, F4 acronyms, stage-5 canonicalization, and
the statistical extractor (A6/A8)."""

from __future__ import annotations

from stanford_relation_extractor_spark.functions.text import (
    acronym,
    blocking_key,
    is_acronym_of,
    no_special_chars,
    same_entity,
    strip_corp,
    token_levenshtein,
)


def test_no_special_chars():
    assert no_special_chars('A-B "C\'s"') == "ab cs"


def test_strip_corp_and_determiner():
    assert strip_corp("The Acme Widget Corp.") == "Acme Widget"
    assert strip_corp("Org007 Inc") == "Org007"


def test_acronym_match():
    assert acronym(["International", "Business", "Machines"]) == "IBM"
    assert is_acronym_of("IBM", ["International", "Business", "Machines"])
    assert is_acronym_of("I.B.M.", ["International", "Business", "Machines"])
    assert not is_acronym_of("IBX", ["International", "Business", "Machines"])


def test_token_levenshtein():
    assert token_levenshtein(["a", "b", "c"], ["a", "x", "c"]) == 1
    assert token_levenshtein(["a"], ["a", "b"]) == 1


def test_same_entity_cascade():
    assert same_entity("Acme Widget Corp", "Acme Widget", "ORGANIZATION")
    assert same_entity("IBM", "International Business Machines", "ORGANIZATION")
    assert same_entity("Acme Widgett", "Acme Widget", "ORGANIZATION")  # lev<=1
    assert not same_entity("Acme Widget", "Zenith Widget", "PERSON")
    assert same_entity("John Q. Smith", "John Smith", "PERSON")
    assert not same_entity("John Smith", "John Jones", "PERSON")


def test_blocking_key_groups_variants():
    assert blocking_key("Acme Widget Corp") == blocking_key("Acme Widget")


def test_canonicalize_entities_merges_variants(spark):
    from stanford_relation_extractor_spark.operators.canonicalize import (
        canonicalize_entities,
    )

    triples = spark.createDataFrame(
        [
            ("Acme Widget", "ORGANIZATION", "org:founded", "1997", "DATE", 2, 0.9),
            ("Acme Widget Corp", "ORGANIZATION", "org:website", "www.a.com", "URL", 2, 0.9),
            ("Zenith Labs", "ORGANIZATION", "org:founded", "1998", "DATE", 2, 0.9),
        ],
        "entity_name string, entity_type string, relation string, slot_value string, "
        "slot_ner string, n_agree int, score double",
    )
    out = canonicalize_entities(triples).collect()
    names = {r["entity_name"] for r in out}
    # the two Acme variants collapse onto one representative; Zenith untouched
    assert len(names) == 2
    assert "Zenith Labs" in names


def test_statistical_extractor_roundtrip(spark):
    from stanford_relation_extractor_spark.operators.statistical import (
        feature_count_filter,
        featurize_pairs,
        score_statistical,
        train_weights,
    )

    sentences = spark.createDataFrame(
        [("c1", 0, "user", 0, "Alice Person000001 works for Org001 .", [])],
        "conv_id string, turn_idx int, role string, sent_idx int, sent_text string, "
        "mentions array<struct<begin:int,end:int,surface:string,ner:string>>",
    )
    pairs = spark.createDataFrame(
        [("c1", 0, 0, "Alice Person000001", "PERSON", 0, 18,
          "Org001", "ORGANIZATION", 29, 35)],
        "conv_id string, turn_idx int, sent_idx int, entity_name string, entity_type string, "
        "entity_begin int, entity_end int, slot_value string, slot_ner string, "
        "slot_begin int, slot_end int",
    )
    feats = featurize_pairs(pairs, sentences)
    got = {r["feature"] for r in feats.collect()}
    assert "arg_order:e_before_s" in got
    assert "type_pair:PERSON:ORGANIZATION" in got
    assert "between:works" in got

    labeled = feats.withColumn(
        "relation", feats.conv_id.substr(0, 0).cast("string")
    )  # placeholder col, replaced below
    labeled = feats.selectExpr("*", "'per:employee_of' AS relation")
    weights = train_weights(labeled)
    assert weights["between:works"]["per:employee_of"] > 0

    votes = score_statistical(feats, weights, ["per:employee_of", "per:member_of"])
    rows = votes.collect()
    by_rel = {r["relation"]: r["score"] for r in rows}
    assert by_rel["per:employee_of"] > by_rel.get("per:member_of", 0.0)
    assert all(r["extractor"] == "statistical" for r in rows)


def test_feature_count_threshold(spark):
    from stanford_relation_extractor_spark.operators.statistical import (
        feature_count_filter,
    )

    feats = spark.createDataFrame(
        [("c1", 0, 0, "E", "PERSON", "S", "NUMBER", "rare")]
        + [("c1", i, 0, "E", "PERSON", "S", "NUMBER", "common") for i in range(5)],
        "conv_id string, turn_idx int, sent_idx int, entity_name string, "
        "entity_type string, slot_value string, slot_ner string, feature string",
    )
    kept = {r["feature"] for r in feature_count_filter(feats).collect()}
    assert kept == {"common"}


def test_word_cluster_features(spark):
    from stanford_relation_extractor_spark.operators.statistical import featurize_pairs

    sentences = spark.createDataFrame(
        [("c1", 0, "user", 0, "Alice Person000001 works for Org001 .", [])],
        "conv_id string, turn_idx int, role string, sent_idx int, sent_text string, "
        "mentions array<struct<begin:int,end:int,surface:string,ner:string>>",
    )
    pairs = spark.createDataFrame(
        [("c1", 0, 0, "Alice Person000001", "PERSON", 0, 18,
          "Org001", "ORGANIZATION", 29, 35)],
        "conv_id string, turn_idx int, sent_idx int, entity_name string, entity_type string, "
        "entity_begin int, entity_end int, slot_value string, slot_ner string, "
        "slot_begin int, slot_end int",
    )
    feats = {
        r["feature"]
        for r in featurize_pairs(pairs, sentences, clusters={"works": 17, "for": 3}).collect()
    }
    assert "between_cluster:17" in feats
    assert "between_cluster:3" in feats
