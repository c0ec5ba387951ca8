"""Deterministic synthetic `transcripts` corpus (shared Spark/DuckDB recipe).

BASELINE.json's `input_hint` fixes the input shape: an Iceberg table
``(conv_id, turn_idx, role, text, tool, ts)`` of multi-turn transcripts.
No such table exists in /root/testdata, so we synthesize one as a *pure
SQL function* of the driver-generated TPC-H-ish tables (orders x
customer x nation, seed=42). The SAME SQL text runs under Spark SQL and
DuckDB, so the driver's oracle sees a byte-identical corpus — this is
the sandbox stand-in for the reference fork's candidate-sentence TSV
(`stanford-kbp/.../slotfilling/evaluate/SimpleSlotFiller.java:112-158`).

Design points (FIXTURES.md §1):
* conversations = customers; ~1/23 of turns are re-routed into one hot
  conversation (conv_000001) to exercise skew handling;
* `turn_idx` is assigned by `row_number() over (partition by conv
  order by o_orderkey)` — the physical row order of the join output is
  arbitrary, so stage-0 ordering is genuinely exercised;
* each turn's text embeds zero or more relation-bearing sentences whose
  shapes mirror the reference's TokensRegex rules (e.g. the per:age
  shapes of `stanford-kbp/edu/stanford/nlp/kbp/per_age.rules:1-9`)
  over a closed cast of synthetic PERSON/ORG/COUNTRY/CITY/DATE/... names.

`turns_base` carries the construction-time ground truth columns (person,
org, country, k, ...) which ONLY oracle SQL may reference; the engine
consumes the 6-column `transcripts` projection.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .tables import register_views

FIRST_NAMES = ("Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry")

# nickname -> canonical first name, modeled on the reference's
# `kbp_male_names.txt` / `kbp_female_names.txt` maps (loaded at
# `.../entitylinking/EntityLinker.java:135-161`). Chosen so that
# "<nick> Person" is never a substring of "<canonical> Person".
NICKNAMES: dict[str, str] = {
    "Ali": "Alice",
    "Bobby": "Bob",
    "Caz": "Carol",
    "Dave": "David",
    # "Emmy", not "Em": a 2-char nickname is within edit distance 1 of
    # the "X." initial form, so the J8 cascade's near-typo branch would
    # merge surfaces the wikidict margin rule deliberately left apart
    "Emmy": "Emma",
    "Frankie": "Frank",
    "Gracie": "Grace",
    "Hank": "Henry",
}
_NICK_OF = {v: k for k, v in NICKNAMES.items()}

# corporate suffixes, modeled on EntityLinker.java:23-37
CORP_SUFFIXES = ("Inc", "Ltd", "Corp")

# k23 nested-org descriptor: 'Securities' is NOT a corporate suffix in
# the reference's CORPORATE_SUFFIXES (EntityLinker.java:23-37), so
# "Org003 Securities" does NOT normalize onto "Org003" — the J8
# token-containment cascade is the only path that can merge them (the
# "Bank of America Securities" case).
ORG_DESCRIPTORS = ("Securities",)

# k22 same-surname adversarial cast: per canonical first name, a
# DISTINCT same-initial first name (edit distance >= 2 from the
# canonical form, its nickname, and the "X." initial form) so the
# surfaces share a J8 block (same surname token + first char) yet must
# NOT merge: not a nickname, no wikidict alias, token overlap 1/2 below
# the PERSON threshold, and beyond the near-typo distance.
SURNAMESAKES: dict[str, str] = {
    "Alice": "Alma",
    "Bob": "Bart",
    "Carol": "Cora",
    "David": "Dora",
    "Emma": "Elsa",
    "Frank": "Fred",
    "Grace": "Gwen",
    "Henry": "Hugo",
}

N_TEMPLATES = 25

_first_name_case = (
    "CASE CAST(o.o_custkey % 8 AS INT) "
    + " ".join(f"WHEN {i} THEN '{n}'" for i, n in enumerate(FIRST_NAMES[:-1]))
    + f" ELSE '{FIRST_NAMES[-1]}' END"
)
_first_name2_case = (
    "CASE CAST((o.o_custkey + 3) % 8 AS INT) "
    + " ".join(f"WHEN {i} THEN '{n}'" for i, n in enumerate(FIRST_NAMES[:-1]))
    + f" ELSE '{FIRST_NAMES[-1]}' END"
)
_nick_case = (
    "CASE CAST(o.o_custkey % 8 AS INT) "
    + " ".join(f"WHEN {i} THEN '{_NICK_OF[n]}'" for i, n in enumerate(FIRST_NAMES[:-1]))
    + f" ELSE '{_NICK_OF[FIRST_NAMES[-1]]}' END"
)
_samesake_case = (
    "CASE CAST(o.o_custkey % 8 AS INT) "
    + " ".join(
        f"WHEN {i} THEN '{SURNAMESAKES[n]}'" for i, n in enumerate(FIRST_NAMES[:-1])
    )
    + f" ELSE '{SURNAMESAKES[FIRST_NAMES[-1]]}' END"
)

# The WITH-clause body shared verbatim by Spark SQL and DuckDB.
TURNS_BASE_CTE = f"""
turns_base AS (
  SELECT
    'conv_' || lpad(CAST(conv_key AS STRING), 6, '0') AS conv_id,
    CAST(row_number() OVER (PARTITION BY conv_key ORDER BY o_orderkey) - 1 AS INT) AS turn_idx,
    CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    CASE WHEN o_orderkey % 3 = 2 THEN 'search' END AS tool,
    ts, k, person, person2, nickperson, initialperson, surnamesake,
    org, org_inc, org_ltd, org_sec,
    country, city, age, yr, n_emp, n_cars, title, website, badsite, soctitle, pron,
    CASE CAST(k AS INT)
      WHEN 0 THEN person || ' , ' || age || ' , lives in ' || country || ' .'
      WHEN 1 THEN person || ' ( ' || age || ' ) works for ' || org || ' .'
      WHEN 2 THEN person || ' is ' || age || ' years old .'
      WHEN 3 THEN person || ' was born in ' || country || ' in ' || yr || ' .'
      WHEN 4 THEN org || ' is headquartered in ' || city || ' .'
      WHEN 5 THEN org || ' was founded by ' || person || ' in ' || yr || ' .'
      WHEN 6 THEN person || ' is married to ' || person2 || ' .'
      WHEN 7 THEN person || ' died in ' || country || ' in ' || yr || ' .'
      WHEN 8 THEN org || ' has ' || n_emp || ' employees .'
      WHEN 9 THEN person || ' , the ' || title || ' of ' || org || ' , spoke .'
      WHEN 10 THEN 'The shipment arrived on time .'
      WHEN 11 THEN 'The website of ' || org || ' is ' || website || ' .'
      WHEN 12 THEN person || ' works for ' || org_inc || ' .'
      WHEN 13 THEN nickperson || ' lives in ' || city || ' .'
      WHEN 14 THEN org_ltd || ' was founded in ' || yr || ' .'
      WHEN 15 THEN person || ' studied at ' || org || ' .'
      -- k16: initial-form surface merged ONLY by wikidict linking (J5/J9)
      WHEN 16 THEN initialperson || ' lives in ' || city || ' .'
      -- k17-k19: adversarial distractors whose ground truth is "no final
      -- triple": age-plausible NUMBER in a non-age context; unrelated
      -- org:website; guideline-invalid per:title
      WHEN 17 THEN person || ' bought ' || n_cars || ' cars .'
      WHEN 18 THEN 'The website of ' || org || ' is ' || badsite || ' .'
      WHEN 19 THEN person || ' , the ' || soctitle || ' , attended the gala .'
      -- k20: pronoun subject — only J2 antecedent propagation can
      -- attribute the residence to the right person
      WHEN 20 THEN pron || ' lives in ' || city || ' .'
      -- k21 (corpus v3, adversarial): CATAPHORIC pronoun — the person
      -- follows the pronoun in the same sentence; J2 must resolve to
      -- the conversation's PRIOR antecedent (or drop), never to the
      -- in-sentence following mention
      WHEN 21 THEN pron || ' greeted ' || person || ' warmly .'
      -- k22 (corpus v4, adversarial): same-surname DISTINCT person —
      -- shares the J8 block with `person` (same surname token + first
      -- char) but must NOT merge (precision, not just boundedness)
      WHEN 22 THEN surnamesake || ' lives in ' || city || ' .'
      -- k23 (corpus v4, adversarial): nested ORG name — 'Securities'
      -- is not a corporate suffix, so only the token-containment
      -- cascade can (and must) merge it onto the parent org
      WHEN 23 THEN org_sec || ' is headquartered in ' || city || ' .'
      -- k24 (corpus v4, adversarial): TWO sentences — entity in the
      -- first, CITY slot in the second; pair generation is strictly
      -- per-sentence, so the ground truth is NO vote at all
      ELSE person || ' arrived early . Flights to ' || city || ' resumed .'
    END AS main_sent,
    CASE WHEN o_orderkey % 2 = 0 THEN ' Thanks for the update .' ELSE '' END AS filler
  FROM (
    SELECT
      o.o_orderkey,
      CASE WHEN o.o_orderkey % 23 = 0 THEN 1 ELSE o.o_custkey END AS conv_key,
      o.o_orderdate AS ts,
      o.o_orderkey % {N_TEMPLATES} AS k,
      {_first_name_case} || ' Person' || lpad(CAST(o.o_custkey AS STRING), 6, '0') AS person,
      {_first_name2_case} || ' Person' || lpad(CAST(o.o_custkey + 500000 AS STRING), 6, '0') AS person2,
      {_nick_case} || ' Person' || lpad(CAST(o.o_custkey AS STRING), 6, '0') AS nickperson,
      substr({_first_name_case}, 1, 1) || '. Person' || lpad(CAST(o.o_custkey AS STRING), 6, '0') AS initialperson,
      {_samesake_case} || ' Person' || lpad(CAST(o.o_custkey AS STRING), 6, '0') AS surnamesake,
      'Org' || lpad(CAST(o.o_orderkey % 10 + 1 AS STRING), 3, '0') AS org,
      'Org' || lpad(CAST(o.o_orderkey % 10 + 1 AS STRING), 3, '0') || ' Inc' AS org_inc,
      'Org' || lpad(CAST(o.o_orderkey % 10 + 1 AS STRING), 3, '0') || ' Ltd' AS org_ltd,
      'Org' || lpad(CAST(o.o_orderkey % 10 + 1 AS STRING), 3, '0') || ' Securities' AS org_sec,
      n.n_name AS country,
      replace(n.n_name, ' ', '') || 'ville' AS city,
      CAST(o.o_orderkey % 63 + 18 AS STRING) AS age,
      CAST(year(o.o_orderdate) AS STRING) AS yr,
      CAST(o.o_orderkey % 900 + 100 AS STRING) AS n_emp,
      CAST(o.o_orderkey % 8 + 2 AS STRING) AS n_cars,
      CASE CAST(o.o_orderkey % 4 AS INT) WHEN 0 THEN 'president' WHEN 1 THEN 'chairman'
           WHEN 2 THEN 'minister' ELSE 'executive' END AS title,
      'www.org' || CAST(o.o_orderkey % 10 + 1 AS STRING) || '.com' AS website,
      'www.shopzone' || CAST(o.o_orderkey % 10 + 1 AS STRING) || '.com' AS badsite,
      'socialite' AS soctitle,
      'He' AS pron
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
  ) src
)"""

TRANSCRIPTS_CTE = (
    "transcripts AS (\n"
    "  SELECT conv_id, turn_idx, role, main_sent || filler AS text, tool, ts\n"
    "  FROM turns_base\n"
    ")"
)

CTE_PREFIX = f"WITH {TURNS_BASE_CTE},\n{TRANSCRIPTS_CTE}"


def oracle_query(body: str) -> str:
    """Wrap an oracle SELECT body with the shared synthetic-corpus CTEs."""
    return f"{CTE_PREFIX}\n{body}"


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic transcripts table as a DataFrame (engine input)."""
    register_views(spark, sf_dir)
    return spark.sql(oracle_query("SELECT * FROM transcripts"))


def turns_base_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth construction columns — tests/oracles only."""
    register_views(spark, sf_dir)
    return spark.sql(oracle_query("SELECT * FROM turns_base"))


def country_gazetteer(spark: SparkSession, sf_dir: str) -> list[str]:
    """The closed COUNTRY surface-form dictionary (the nation dim table).

    Analog of the reference gazetteers `kbp_code2country.tab` /
    `kbp_alternate_country_names.tab` consumed at
    `.../evaluate/WorldKnowledgePostProcessor.java:300-388`. 25 rows —
    always driver-collected and broadcast into the mention detector.
    """
    register_views(spark, sf_dir)
    return [r[0] for r in spark.sql("SELECT DISTINCT n_name FROM nation").collect()]


# --- entity-linking fixtures (shared Spark/DuckDB CTEs) ---------------------

# wikidict-style alias dictionary (word -> article, score), modeled on
# `.../entitylinking/WikidictEntityLinker.java:29-43,76-115`. One
# unambiguous nickname alias per customer (score 0.9) plus, for every
# 10th customer, a competing sense at 0.7 so the margin rule
# (top-1 >= 1.5 x top-2, TextOps.java:326-343) rejects the link.
ALIAS_DICT_CTE = """
persons AS (
  SELECT DISTINCT person, person2, nickperson, initialperson FROM turns_base
),
alias_dict AS (
  SELECT lower(person) AS alias, person AS canonical, 1.0 AS link_score FROM persons
  UNION ALL
  SELECT lower(nickperson) AS alias, person AS canonical, 0.9 AS link_score FROM persons
  UNION ALL
  SELECT lower(nickperson) AS alias, person2 AS canonical, 0.7 AS link_score
  FROM persons
  WHERE CAST(substr(person, length(person) - 5, 6) AS INT) % 10 = 0
  UNION ALL
  SELECT lower(initialperson) AS alias, person AS canonical, 0.8 AS link_score FROM persons
  UNION ALL
  SELECT lower(initialperson) AS alias, person2 AS canonical, 0.7 AS link_score
  FROM persons
  WHERE CAST(substr(person, length(person) - 5, 6) AS INT) % 10 = 0
)"""

# undirected surface-equivalence edges for connected components (J9):
# person -- nickperson -- lowercase(person) chains, one per customer.
CC_EDGES_CTE = """
cc_edges AS (
  SELECT person AS src, nickperson AS dst FROM (SELECT DISTINCT person, nickperson FROM turns_base)
  UNION ALL
  SELECT nickperson AS src, lower(person) AS dst FROM (SELECT DISTINCT person, nickperson FROM turns_base)
)"""


def oracle_query_linking(body: str, recursive: bool = False) -> str:
    """Oracle wrapper including the alias/CC fixture CTEs."""
    prefix = CTE_PREFIX.replace("WITH ", "WITH RECURSIVE ", 1) if recursive else CTE_PREFIX
    return f"{prefix},\n{ALIAS_DICT_CTE},\n{CC_EDGES_CTE}\n{body}"


_ALIAS_DICT_CACHE: dict[tuple[int, str], DataFrame] = {}


def alias_dict_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wikidict-style alias dimension. In production this is a
    static table read once; here it derives from a join over the TPC-H
    dims, so the session memo (localCheckpoint-backed) keeps repeated
    pipeline builds from re-running that join — it showed up as pure
    serial cost inside the canonicalization window."""
    # evict entries whose owning session has stopped: a dead-context
    # DataFrame is unusable, and the localCheckpoint blocks it pins
    # (plus the session object itself) would otherwise live for the
    # process lifetime under an id()-keyed memo
    for k, df in list(_ALIAS_DICT_CACHE.items()):
        try:
            stopped = df.sparkSession.sparkContext._jsc is None
        except Exception:
            stopped = True
        if stopped:
            del _ALIAS_DICT_CACHE[k]
    key = (id(spark), sf_dir)
    cached = _ALIAS_DICT_CACHE.get(key)
    if cached is not None:
        return cached
    register_views(spark, sf_dir)
    df = spark.sql(
        oracle_query_linking("SELECT * FROM alias_dict")
    ).localCheckpoint(eager=True)
    _ALIAS_DICT_CACHE[key] = df
    return df


def cc_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(oracle_query_linking("SELECT * FROM cc_edges"))


# canonicalization transforms (J6 nickname join + F5 suffix strip) as a
# SQL expression generator, applied identically by oracle SQL; the
# engine applies the same semantics via operators/linking.py.
def canon_sql(col: str) -> str:
    expr = col
    for nick, full in sorted(NICKNAMES.items()):
        expr = f"replace({expr}, '{nick} Person', '{full} Person')"
    suffixes = "|".join(CORP_SUFFIXES)
    return f"regexp_replace({expr}, ' ({suffixes})$', '')"


def detector_config(countries: list[str]) -> list[tuple[str, str]]:
    """Mention-detector (ner, regex) priority list for this corpus.

    The detector engine (operators/mentions.py) is config-driven — this
    is the regexner-style rule set (cf. the reference's
    `kbp_regexner_mapping.tab`) matching the synthetic cast. Priority
    order resolves overlaps (URL before NUMBER, DATE before NUMBER, ...).
    """
    country_alt = "|".join(sorted(map(re.escape, countries), key=len, reverse=True))
    first_alt = "|".join(
        list(FIRST_NAMES)
        + sorted(NICKNAMES, key=len, reverse=True)
        + sorted(SURNAMESAKES.values())
    )
    suffix_alt = "|".join(CORP_SUFFIXES + ORG_DESCRIPTORS)
    return [
        ("URL", r"\bwww\.[a-z0-9]+\.com\b"),
        ("PERSON", rf"\b(?:(?:{first_alt}) Person[0-9]{{6}}|[A-Z]\. Person[0-9]{{6}})\b"),
        ("ORGANIZATION", rf"\bOrg[0-9]{{3}}(?: (?:{suffix_alt}))?\b"),
        ("CITY", r"\b[A-Z][A-Z0-9_]*ville\b"),
        ("COUNTRY", rf"\b(?:{country_alt})\b"),
        ("DATE", r"\b(?:19|20)[0-9]{2}\b"),
        ("NUMBER", r"\b[0-9]+\b"),
        ("TITLE", r"\b(?:president|chairman|minister|executive|socialite)\b"),
        ("PRONOUN", r"\b(?:He|She|They|It)\b"),
    ]
