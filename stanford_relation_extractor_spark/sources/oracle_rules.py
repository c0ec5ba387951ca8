"""Construction-time ground truth for the synthetic corpus -> oracle SQL.

Each synthetic template (sources/synthetic.py) plants known mentions and
relation assertions. This module declares, as data, exactly which votes
the reference-semantics ensemble must cast for each template, and
generates ANSI SQL (runnable by DuckDB over the shared CTEs) that
enumerates them — the driver's independent check of the Spark engine.

This is the "frozen pure-Python reference ensemble" of BASELINE.md: the
P/R >= 0.95 gate compares the engine's emitted triples against the SQL
derivation below, which never executes any engine code.

Vote weights mirror operators/extractors.py by DESIGN CONTRACT (the
numbers are part of the ensemble spec, not an implementation detail):
pattern 0.9, trigger 0.8, window 0.4/|admissible relations|.
"""

from __future__ import annotations

from ..ontology import RELATION_BY_NAME, compatible_relations
from .synthetic import canon_sql, oracle_query

PATTERN_WEIGHT = 0.9
TRIGGER_WEIGHT = 0.8
WINDOW_WEIGHT = 0.4

# column -> entity/NER type of each planted mention, per template k
TEMPLATE_MENTIONS: dict[int, list[tuple[str, str]]] = {
    0: [("person", "PERSON"), ("age", "NUMBER"), ("country", "COUNTRY")],
    1: [("person", "PERSON"), ("age", "NUMBER"), ("org", "ORGANIZATION")],
    2: [("person", "PERSON"), ("age", "NUMBER")],
    3: [("person", "PERSON"), ("country", "COUNTRY"), ("yr", "DATE")],
    4: [("org", "ORGANIZATION"), ("city", "CITY")],
    5: [("org", "ORGANIZATION"), ("person", "PERSON"), ("yr", "DATE")],
    6: [("person", "PERSON"), ("person2", "PERSON")],
    7: [("person", "PERSON"), ("country", "COUNTRY"), ("yr", "DATE")],
    8: [("org", "ORGANIZATION"), ("n_emp", "NUMBER")],
    9: [("person", "PERSON"), ("title", "TITLE"), ("org", "ORGANIZATION")],
    10: [],
    11: [("org", "ORGANIZATION"), ("website", "URL")],
    12: [("person", "PERSON"), ("org_inc", "ORGANIZATION")],
    13: [("nickperson", "PERSON"), ("city", "CITY")],
    14: [("org_ltd", "ORGANIZATION"), ("yr", "DATE")],
    15: [("person", "PERSON"), ("org", "ORGANIZATION")],
}

_NER_OF = {col: ner for ms in TEMPLATE_MENTIONS.values() for col, ner in ms}
_NER_OF["person2"] = "PERSON"

# (entity_col, slot_col, relation) votes per template
PATTERN_VOTES: dict[int, list[tuple[str, str, str]]] = {
    0: [("person", "age", "per:age"), ("person", "country", "per:countries_of_residence")],
    1: [("person", "age", "per:age"), ("person", "org", "per:employee_of")],
    2: [("person", "age", "per:age")],
    3: [("person", "country", "per:country_of_birth"), ("person", "yr", "per:date_of_birth")],
    4: [("org", "city", "org:city_of_headquarters")],
    5: [("org", "person", "org:founded_by"), ("org", "yr", "org:founded")],
    6: [("person", "person2", "per:spouse")],
    7: [("person", "country", "per:country_of_death"), ("person", "yr", "per:date_of_death")],
    8: [("org", "n_emp", "org:number_of_employees/members")],
    9: [
        ("person", "title", "per:title"),
        ("org", "person", "org:top_members/employees"),
        ("person", "org", "per:employee_of"),
    ],
    10: [],
    11: [("org", "website", "org:website")],
    12: [("person", "org_inc", "per:employee_of")],
    13: [("nickperson", "city", "per:cities_of_residence")],
    14: [("org_ltd", "yr", "org:founded")],
    15: [("person", "org", "per:schools_attended")],
}

TRIGGER_VOTES: dict[int, list[tuple[str, str, str]]] = {
    0: [("person", "country", "per:countries_of_residence")],
    1: [("person", "org", "per:employee_of")],
    2: [],
    3: [("person", "country", "per:country_of_birth"), ("person", "yr", "per:date_of_birth")],
    4: [("org", "city", "org:city_of_headquarters")],
    5: [("org", "person", "org:founded_by"), ("org", "yr", "org:founded")],
    6: [("person", "person2", "per:spouse")],
    7: [("person", "country", "per:country_of_death"), ("person", "yr", "per:date_of_death")],
    8: [("org", "n_emp", "org:number_of_employees/members")],
    9: [("person", "title", "per:title"), ("org", "person", "org:top_members/employees")],
    10: [],
    11: [("org", "website", "org:website")],
    12: [("person", "org_inc", "per:employee_of")],
    13: [("nickperson", "city", "per:cities_of_residence")],
    14: [("org_ltd", "yr", "org:founded")],
    15: [("person", "org", "per:schools_attended")],
}


def window_votes(k: int) -> list[tuple[str, str, str, float]]:
    """(entity_col, slot_col, relation, weight) for the window extractor."""
    out = []
    ms = TEMPLATE_MENTIONS[k]
    for ecol, ener in ms:
        if ener not in ("PERSON", "ORGANIZATION"):
            continue
        for scol, sner in ms:
            if scol == ecol:
                continue
            rels = compatible_relations(ener, sner)
            if not rels:
                continue
            w = round(WINDOW_WEIGHT / len(rels), 6)
            out.extend((ecol, scol, rel, w) for rel in rels)
    return out


def _vote_select(k: int, ecol: str, scol: str, rel: str, extractor: str, score: float) -> str:
    etype = _NER_OF[ecol] if _NER_OF[ecol] in ("PERSON", "ORGANIZATION") else "PERSON"
    sner = _NER_OF[scol]
    return (
        f"SELECT conv_id, turn_idx, {ecol} AS entity_name, '{etype}' AS entity_type, "
        f"{scol} AS slot_value, '{sner}' AS slot_ner, '{rel}' AS relation, "
        f"'{extractor}' AS extractor, CAST({score!r} AS DOUBLE) AS score "
        f"FROM turns_base WHERE k = {k}"
    )


def votes_union_sql() -> str:
    """All expected extractor votes as one UNION ALL query body."""
    branches: list[str] = []
    for k in sorted(TEMPLATE_MENTIONS):
        for ecol, scol, rel in PATTERN_VOTES[k]:
            branches.append(_vote_select(k, ecol, scol, rel, "pattern", PATTERN_WEIGHT))
        for ecol, scol, rel in TRIGGER_VOTES[k]:
            branches.append(_vote_select(k, ecol, scol, rel, "trigger", TRIGGER_WEIGHT))
        for ecol, scol, rel, w in window_votes(k):
            branches.append(_vote_select(k, ecol, scol, rel, "window", w))
    return "\nUNION ALL\n".join(branches)


def mentions_sql() -> str:
    """Expected (conv_id, turn_idx, sent_idx, surface, ner) mention rows."""
    branches = [
        f"SELECT conv_id, turn_idx, 0 AS sent_idx, {col} AS surface, '{ner}' AS ner "
        f"FROM turns_base WHERE k = {k}"
        for k in sorted(TEMPLATE_MENTIONS)
        for col, ner in TEMPLATE_MENTIONS[k]
    ]
    return oracle_query("\nUNION ALL\n".join(branches))


def votes_sql() -> str:
    return oracle_query(votes_union_sql())


_ENSEMBLE_BODY = """
, votes AS (
{votes}
), per_ex AS (
  -- stage 4 LINK applied before grouping: nickname canonicalization
  -- (J6) + corporate-suffix strip (F5) on both name columns
  SELECT {canon_entity} AS entity_name, entity_type, relation,
         {canon_slot} AS slot_value, slot_ner, extractor, max(score) AS w
  FROM votes
  GROUP BY 1, 2, 3, 4, 5, 6
), ens AS (
  SELECT entity_name, entity_type, relation, slot_value, slot_ner,
         CAST(count(*) AS INT) AS n_agree,
         round(1 - exp(sum(ln(1 - w))), 6) AS score
  FROM per_ex
  GROUP BY entity_name, entity_type, relation, slot_value, slot_ner
)
"""


def _ensemble_body() -> str:
    return _ENSEMBLE_BODY.format(
        votes=votes_union_sql(),
        canon_entity=canon_sql("entity_name"),
        canon_slot=canon_sql("slot_value"),
    )


def ensemble_sql() -> str:
    return oracle_query(_ensemble_body() + "SELECT * FROM ens")


def final_triples_sql(threshold: float = 0.5) -> str:
    """Ensemble -> threshold (P7) -> SINGLE-cardinality top-1 (W2/W4)."""
    singles = ", ".join(
        f"'{name}'" for name, r in sorted(RELATION_BY_NAME.items()) if r.cardinality == "SINGLE"
    )
    body = _ensemble_body() + f"""
SELECT entity_name, entity_type, relation, slot_value, slot_ner, n_agree, score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY entity_name, entity_type, relation
    ORDER BY score DESC,
             (length(slot_value) - length(replace(slot_value, ' ', ''))) DESC,
             length(slot_value) DESC,
             slot_value ASC
  ) AS rn
  FROM ens
  WHERE score >= {threshold!r}
) t
WHERE relation NOT IN ({singles}) OR rn = 1
"""
    return oracle_query(body)
