"""Mention detector unit tests (SlotMentionAnnotator / TextOps analogs)."""

from __future__ import annotations

import re

from stanford_relation_extractor_spark.operators.mentions import detect, split_sentences
from stanford_relation_extractor_spark.sources.synthetic import detector_config


def _matchers(countries=("NATION_2", "NATION_21")):
    return [(ner, re.compile(rx)) for ner, rx in detector_config(list(countries))]


def test_split_keeps_urls_intact():
    s = split_sentences("The website of Org001 is www.org1.com . Thanks for the update .")
    assert s == ["The website of Org001 is www.org1.com .", "Thanks for the update ."]


def test_priority_date_over_number():
    out = detect("Alice Person000001 was born in NATION_2 in 1995 .", _matchers())
    ners = {m["surface"]: m["ner"] for m in out}
    assert ners["1995"] == "DATE"
    assert ners["NATION_2"] == "COUNTRY"
    assert ners["Alice Person000001"] == "PERSON"


def test_country_prefix_not_shadowed():
    out = detect("Bob Person000002 lives in NATION_21 .", _matchers())
    assert {m["surface"] for m in out if m["ner"] == "COUNTRY"} == {"NATION_21"}


def test_cityville_not_country():
    out = detect("Org003 is headquartered in NATION_2ville .", _matchers())
    by_ner = {m["ner"]: m["surface"] for m in out}
    assert by_ner.get("CITY") == "NATION_2ville"
    assert "COUNTRY" not in by_ner


def test_number_inside_token_not_matched():
    out = detect("Org007 has 250 employees .", _matchers())
    nums = [m["surface"] for m in out if m["ner"] == "NUMBER"]
    assert nums == ["250"]  # not the 007 inside Org007


def test_offsets_are_span_exact():
    text = "Carol Person000010 ( 44 ) works for Org004 ."
    for m in detect(text, _matchers()):
        assert text[m["begin"] : m["end"]] == m["surface"]
