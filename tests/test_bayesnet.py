"""BLN / BayesNet MAP solver (operators/bayesnet.py) — the net-level
cases re-assert the reference's own `BayesNetTest.java:139-244`
expectations (there reached via gibbsMAP+hillclimb; here via the exact
deterministic MAP), plus the acyclic selection of
`BayesianLogicNetworkTest.java` and the Spark-level clustered pass."""

from __future__ import annotations

import math

from stanford_relation_extractor_spark.operators.bayesnet import (
    _ground,
    admit_rules,
    infer_map_triples,
    make_acyclic,
    solve_map,
)
from stanford_relation_extractor_spark.operators.inference import parse_mln


def _logit(p: float) -> float:
    return math.log(p / (1.0 - p))


CHAIN_MLN = f"""
likes(PERSON, COUNTRY)
origin(PERSON, COUNTRY)
welcomes(COUNTRY, PERSON)
{_logit(0.8)} !origin(x, y) v likes(x, y)
{_logit(0.8)} !likes(x, y) v welcomes(y, x)
"""


def _map_set(rows, mln, world=None, **kw):
    predicates, rules = parse_mln(mln)
    net = _ground(rows, admit_rules(rules), predicates, world or {})
    assign, _probs = solve_map(net, **kw)
    return {k for i, k in enumerate(net.keys) if assign[i]}


def test_unary_factors_trivial():
    """BayesNetTest.testBayesNetGibbsUnaryFactorsTrivial: priors 1.0,
    0.2, 1.0 -> exactly the two high-prior literals are MAP-true.
    (score s maps to prior prob (1+s)/2, so s = 2p-1.)"""
    mln = "likes(PERSON, COUNTRY)\norigin(PERSON, COUNTRY)\nis(PERSON, TITLE)\n"
    rows = [
        ("Julie", "PERSON", "likes", "Canada", "COUNTRY", 1.0),
        ("Julie", "PERSON", "origin", "Finnish", "NATIONALITY", -0.6),
        ("Arun", "PERSON", "is", "Student", "TITLE", 1.0),
    ]
    assert _map_set(rows, mln) == {
        ("likes", "Julie", "Canada"),
        ("is", "Arun", "Student"),
    }


def test_chain_rule_inference_simple():
    """BayesNetTest.testBayesNetChainRuleInference (first case): a
    certain origin chains through two 0.8 entailments — the far
    consequent comes out MAP-true."""
    rows = [("Julie", "PERSON", "origin", "Canada", "COUNTRY", 1.0)]
    out = _map_set(rows, CHAIN_MLN)
    assert ("welcomes", "Canada", "Julie") in out
    assert ("likes", "Julie", "Canada") in out


def test_chain_rule_inference_with_priors():
    """BayesNetTest.testBayesNetChainRuleInference (second case):
    sub-0.5 priors (0.29) on both consequents flip true under 0.9-rule
    support from a 0.99 origin."""
    mln = f"""
likes(PERSON, COUNTRY)
origin(PERSON, COUNTRY)
welcomes(COUNTRY, PERSON)
{_logit(0.9)} !origin(x, y) v likes(x, y)
{_logit(0.9)} !likes(x, y) v welcomes(y, x)
"""
    rows = [
        ("Julie", "PERSON", "likes", "Canada", "COUNTRY", 2 * 0.29 - 1),
        ("Canada", "COUNTRY", "welcomes", "Julie", "PERSON", 2 * 0.29 - 1),
        ("Julie", "PERSON", "origin", "Canada", "COUNTRY", 2 * 0.99 - 1),
    ]
    out = _map_set(rows, mln)
    assert ("likes", "Julie", "Canada") in out
    assert ("welcomes", "Canada", "Julie") in out


def test_unsupported_low_prior_stays_false():
    """A 0.29-prior literal with NO rule support stays MAP-false while
    the same prior WITH support flips (the joint decision the greedy
    rule-table engine cannot make)."""
    mln = f"""
likes(PERSON, COUNTRY)
origin(PERSON, COUNTRY)
{_logit(0.9)} !origin(x, y) v likes(x, y)
"""
    rows = [
        ("Julie", "PERSON", "likes", "Canada", "COUNTRY", 2 * 0.29 - 1),
        ("Julie", "PERSON", "likes", "Peru", "COUNTRY", 2 * 0.29 - 1),
        ("Julie", "PERSON", "origin", "Canada", "COUNTRY", 2 * 0.99 - 1),
    ]
    out = _map_set(rows, mln)
    assert ("likes", "Julie", "Canada") in out
    assert ("likes", "Julie", "Peru") not in out


def test_icm_matches_exact_on_chain():
    """Forcing the ICM fallback (max_exact_vars=1) reproduces the exact
    MAP on the chain net — the deterministic large-component path."""
    rows = [("Julie", "PERSON", "origin", "Canada", "COUNTRY", 1.0)]
    assert _map_set(rows, CHAIN_MLN, max_exact_vars=1) == _map_set(
        rows, CHAIN_MLN
    )


def test_cyclic_rules_solve_and_acyclic_drops():
    """Symmetric spouse rules form the cycle bounded chaining cannot
    express as one joint net: the MAP keeps both directions; makeAcyclic
    (BayesianLogicNetwork.java:34-72) drops the self-symmetric rule."""
    mln = f"""
per:spouse(PERSON, PERSON)
{_logit(0.9)} !per:spouse(x, y) v per:spouse(y, x)
"""
    predicates, rules = parse_mln(mln)
    rows = [("Ann", "PERSON", "per:spouse", "Bob", "PERSON", 0.8)]
    net = _ground(rows, admit_rules(rules), predicates, {})
    assign, _ = solve_map(net)
    true_set = {k for i, k in enumerate(net.keys) if assign[i]}
    assert ("per:spouse", "Ann", "Bob") in true_set
    assert ("per:spouse", "Bob", "Ann") in true_set
    assert make_acyclic(rules) == []


def test_make_acyclic_reference_case():
    """BayesianLogicNetworkTest.testMakeAcyclic: of the two symmetric
    likes<->lives_in rules only the first-sorted survives; the chained
    works_at rule survives."""
    mln = """
likes(PERSON, PLACE)
lives_in(PERSON, PLACE)
works_at(PERSON, ORGANIZATION)
headquartered_at(ORGANIZATION, PLACE)
0.9 !likes(x0, x1) v lives_in(x0, x1)
0.9 !lives_in(x0, x1) v likes(x0, x1)
0.9 !works_at(x0, x1) v !headquartered_at(x1, x2) v likes(x0, x2)
"""
    _preds, rules = parse_mln(mln)
    kept = make_acyclic(rules)
    heads = [r.head.pred for r in kept]
    assert heads == ["lives_in", "likes"]
    assert len(kept[1].body) == 2  # the works_at chain rule


def test_spark_clustered_map_inference(spark):
    """The distributed pass: a gazetteer-lifted country fill comes out
    novel with the rule's sigmoid probability; the geo evidence literal
    itself is not emitted; the input fill survives with its prior."""
    triples = spark.createDataFrame(
        [
            ("Ann", "PERSON", "per:city_of_birth", "Oslo", "CITY", 0.9),
            ("Zed", "PERSON", "per:city_of_birth", "Lima", "CITY", 0.8),
        ],
        "entity_name string, entity_type string, relation string, "
        "slot_value string, slot_ner string, score double",
    )
    geo = spark.createDataFrame(
        [("Oslo", "Norway"), ("Lima", "Peru")], "city string, country string"
    )
    out = {
        (r.entity_name, r.relation, r.slot_value): r
        for r in infer_map_triples(triples, geo, spark).collect()
    }
    born = out[("Ann", "per:country_of_birth", "Norway")]
    assert born.novel and born.slot_ner == "COUNTRY"
    assert abs(born.score - 1.0 / (1.0 + math.exp(-0.9))) < 1e-4
    kept = out[("Ann", "per:city_of_birth", "Oslo")]
    assert not kept.novel and abs(kept.score - 0.95) < 1e-6
    assert ("Zed", "per:country_of_birth", "Peru") in out
    assert not any(rel.startswith("geo:") for _e, rel, _s in out)
