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

from ..ontology import RELATION_BY_NAME, compatible_relations, plausibly_cooccurs
from ..operators.consistency import (
    INVALID_ORG_ALT_NAMES,
    INVALID_TITLES,
    INVALID_TOP_EMPLOYEES,
)
from .synthetic import canon_sql, oracle_query


def _sql_list(values: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in values)

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
    16: [("initialperson", "PERSON"), ("city", "CITY")],
    17: [("person", "PERSON"), ("n_cars", "NUMBER")],
    18: [("org", "ORGANIZATION"), ("badsite", "URL")],
    19: [("person", "PERSON"), ("soctitle", "TITLE")],
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
    16: [("initialperson", "city", "per:cities_of_residence")],
    # k17: adversarial negative — an age-plausible NUMBER in a non-age
    # context draws NO pattern/trigger vote (window-only, sub-threshold)
    17: [],
    # k18/k19 DO draw pattern votes; the consistency battery's
    # guideline-conformance pass (P8/P9) must kill them downstream
    18: [("org", "badsite", "org:website")],
    19: [("person", "soctitle", "per:title")],
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
    16: [("initialperson", "city", "per:cities_of_residence")],
    17: [],
    18: [("org", "badsite", "org:website")],
    19: [("person", "soctitle", "per:title")],
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


def _sanity_pred(rel: str, scol: str) -> str:
    """SQL twin of extractors.slot_sanity_ok for the oracle's vote rows
    (numeric plausibility bands; length/self-fill never bind on the
    synthetic cast)."""
    if rel == "per:age":
        return f" AND CAST({scol} AS INT) BETWEEN 1 AND 125"
    if rel == "org:number_of_employees/members":
        return f" AND CAST({scol} AS INT) BETWEEN 25 AND 500000"
    return ""


def _vote_select(k: int, ecol: str, scol: str, rel: str, extractor: str, score: float) -> str:
    etype = _NER_OF[ecol] if _NER_OF[ecol] in ("PERSON", "ORGANIZATION") else "PERSON"
    sner = _NER_OF[scol]
    return (
        f"SELECT conv_id, turn_idx, {ecol} AS entity_name, '{etype}' AS entity_type, "
        f"{scol} AS slot_value, '{sner}' AS slot_ner, '{rel}' AS relation, "
        f"'{extractor}' AS extractor, CAST({score!r} AS DOUBLE) AS score "
        f"FROM turns_base WHERE k = {k}{_sanity_pred(rel, scol)}"
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


def topk_sentences_sql(k: int = 5) -> str:
    """W7 oracle: per-entity sentence budget with text dedup."""
    branches = [
        f"SELECT {col} AS entity_name, conv_id, turn_idx, 0 AS sent_idx, main_sent AS sent_text "
        f"FROM turns_base WHERE k = {kk}"
        for kk in sorted(TEMPLATE_MENTIONS)
        for col, ner in TEMPLATE_MENTIONS[kk]
        if ner in ("PERSON", "ORGANIZATION")
    ]
    body = f"""
, ent_sent AS (
{' UNION ALL '.join(branches)}
), dedup AS (
  SELECT *, row_number() OVER (PARTITION BY entity_name, sent_text
                               ORDER BY conv_id, turn_idx, sent_idx) AS d
  FROM ent_sent
), budget AS (
  SELECT entity_name, conv_id, turn_idx, sent_idx, sent_text,
         row_number() OVER (PARTITION BY entity_name
                            ORDER BY conv_id, turn_idx, sent_idx) AS r
  FROM dedup WHERE d = 1
)
SELECT entity_name, conv_id, turn_idx, sent_idx, sent_text FROM budget WHERE r <= {k}
"""
    return oracle_query(body)


def ner_majority_sql() -> str:
    """A5 oracle: majority NER tag per surface across mentions."""
    branches = [
        f"SELECT {col} AS surface, '{ner}' AS ner FROM turns_base WHERE k = {kk}"
        for kk in sorted(TEMPLATE_MENTIONS)
        for col, ner in TEMPLATE_MENTIONS[kk]
    ]
    body = f"""
, men AS (
{' UNION ALL '.join(branches)}
), counts AS (
  SELECT surface, ner, count(*) AS n FROM men GROUP BY surface, ner
), ranked AS (
  SELECT surface, ner, n,
         row_number() OVER (PARTITION BY surface ORDER BY n DESC, ner ASC) AS r
  FROM counts
)
SELECT surface, ner AS majority_ner, CAST(n AS BIGINT) AS votes FROM ranked WHERE r = 1
"""
    return oracle_query(body)


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


_W4 = (
    "score DESC, "
    "(length(slot_value) - length(replace(slot_value, ' ', ''))) DESC, "
    "length(slot_value) DESC, slot_value ASC, relation ASC"
)


def _allowed_pairs_values() -> str:
    """Ordered relation pairs allowed to share (entity, slotValue)."""
    rows = []
    for a in RELATION_BY_NAME:
        for b in RELATION_BY_NAME:
            if a != b and plausibly_cooccurs(a, b):
                rows.append(f"('{a}', '{b}')")
    return ", ".join(sorted(rows))


def _final_body(threshold: float = 0.5) -> str:
    """CTE chain ending in ``final_out`` — the consistency battery:
    ensemble -> threshold (P7) -> SINGLE-cardinality top-1 (W2/W4) ->
    declared-incompatibility drop (O6) -> loc-of-death mitigation."""
    singles = ", ".join(
        f"'{name}'" for name, r in sorted(RELATION_BY_NAME.items()) if r.cardinality == "SINGLE"
    )
    return _ensemble_body() + f"""
, base AS (
  -- P7 threshold + P8/P9 guideline conformance (consistency.py
  -- conform_to_guidelines): invalid titles / top-employees / org alt
  -- names, DATE slot shape, org:website token-stem relatedness
  SELECT entity_name, entity_type, relation, slot_value, slot_ner, n_agree, score
  FROM ens WHERE score >= {threshold!r}
    AND NOT (relation = 'per:title' AND lower(slot_value) IN ({_sql_list(INVALID_TITLES)}))
    AND NOT (relation = 'org:top_members/employees'
             AND lower(slot_value) IN ({_sql_list(INVALID_TOP_EMPLOYEES)}))
    AND NOT (relation = 'org:alternate_names'
             AND lower(slot_value) IN ({_sql_list(INVALID_ORG_ALT_NAMES)}))
    AND (slot_ner <> 'DATE'
         OR regexp_matches(slot_value, '^[0-9]{{4}}([-/][0-9]{{1,2}}([-/][0-9]{{1,2}})?)?$'))
    AND (relation <> 'org:website'
         OR (length(lower(regexp_extract(entity_name, '([A-Za-z]+)', 1))) >= 3
             AND contains(lower(slot_value),
                          lower(regexp_extract(entity_name, '([A-Za-z]+)', 1)))))
), allowed(r_hi, r_lo) AS (
  SELECT * FROM (VALUES {_allowed_pairs_values()}) v(r_hi, r_lo)
), ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY entity_name, entity_type, slot_value ORDER BY {_W4}
         ) AS rk,
         row_number() OVER (
           PARTITION BY entity_name, entity_type, relation ORDER BY {_W4}
         ) AS rel_rn
  FROM base
), conflict AS (
  -- greedy-loop fidelity: only fills surviving their relation's
  -- cardinality top-1 can block others
  SELECT DISTINCT lo.entity_name, lo.entity_type, lo.relation, lo.slot_value
  FROM ranked lo
  JOIN ranked hi
    ON hi.entity_name = lo.entity_name AND hi.entity_type = lo.entity_type
   AND hi.slot_value = lo.slot_value AND hi.rk < lo.rk AND hi.relation <> lo.relation
   AND (hi.relation NOT IN ({singles}) OR hi.rel_rn = 1)
  WHERE NOT EXISTS (
    SELECT 1 FROM allowed a WHERE a.r_hi = hi.relation AND a.r_lo = lo.relation
  )
), ok AS (
  SELECT b.* FROM base b
  LEFT JOIN conflict c
    ON c.entity_name = b.entity_name AND c.entity_type = b.entity_type
   AND c.relation = b.relation AND c.slot_value = b.slot_value
  WHERE c.entity_name IS NULL
), kept2 AS (
  SELECT entity_name, entity_type, relation, slot_value, slot_ner, n_agree, score
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY entity_name, entity_type, relation ORDER BY {_W4}
    ) AS rn
    FROM ok
  ) t
  WHERE relation NOT IN ({singles}) OR rn = 1
), final_out AS (
  SELECT * FROM kept2
  WHERE kept2.relation NOT IN ('per:city_of_death', 'per:country_of_death', 'per:stateorprovince_of_death')
     OR EXISTS (
       SELECT 1 FROM kept2 d
       WHERE d.relation = 'per:date_of_death'
         AND d.entity_name = kept2.entity_name AND d.entity_type = kept2.entity_type
     )
)
"""


def final_triples_sql(threshold: float = 0.5) -> str:
    return oracle_query(_final_body(threshold) + "SELECT * FROM final_out")


def nil_padded_sql(threshold: float = 0.5) -> str:
    """S10 oracle: full (person query x PER relation) grid, NIL-padded."""
    per_rels = ", ".join(
        f"('{name}')" for name in sorted(RELATION_BY_NAME) if name.startswith("per:")
    )
    body = _final_body(threshold) + f"""
, grid AS (
  SELECT p.person AS query_id, p.person AS entity_name, r.relation
  FROM (SELECT DISTINCT person FROM turns_base) p
  CROSS JOIN (SELECT * FROM (VALUES {per_rels}) v(relation)) r
)
SELECT g.query_id, g.entity_name, g.relation,
       coalesce(t.slot_value, 'NIL') AS slot_value,
       coalesce(t.score, 0.0) AS score
FROM grid g
LEFT JOIN final_out t
  ON t.entity_name = g.entity_name AND t.relation = g.relation
 AND t.entity_type = 'PERSON'
"""
    return oracle_query(body)
