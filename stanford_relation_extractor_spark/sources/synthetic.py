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

N_TEMPLATES = 12

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

# The WITH-clause body shared verbatim by Spark SQL and DuckDB.
TURNS_BASE_CTE = f"""
turns_base AS (
  SELECT
    'conv_' || lpad(CAST(conv_key AS STRING), 6, '0') AS conv_id,
    CAST(row_number() OVER (PARTITION BY conv_key ORDER BY o_orderkey) - 1 AS INT) AS turn_idx,
    CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    CASE WHEN o_orderkey % 3 = 2 THEN 'search' END AS tool,
    ts, k, person, person2, org, country, city, age, yr, n_emp, title, website,
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
      ELSE 'The website of ' || org || ' is ' || website || ' .'
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
      'Org' || lpad(CAST(o.o_orderkey % 10 + 1 AS STRING), 3, '0') AS org,
      n.n_name AS country,
      replace(n.n_name, ' ', '') || 'ville' AS city,
      CAST(o.o_orderkey % 63 + 18 AS STRING) AS age,
      CAST(year(o.o_orderdate) AS STRING) AS yr,
      CAST(o.o_orderkey % 900 + 100 AS STRING) AS n_emp,
      CASE CAST(o.o_orderkey % 4 AS INT) WHEN 0 THEN 'president' WHEN 1 THEN 'chairman'
           WHEN 2 THEN 'minister' ELSE 'executive' END AS title,
      'www.org' || CAST(o.o_orderkey % 10 + 1 AS STRING) || '.com' AS website
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


def detector_config(countries: list[str]) -> list[tuple[str, str]]:
    """Mention-detector (ner, regex) priority list for this corpus.

    The detector engine (operators/mentions.py) is config-driven — this
    is the regexner-style rule set (cf. the reference's
    `kbp_regexner_mapping.tab`) matching the synthetic cast. Priority
    order resolves overlaps (URL before NUMBER, DATE before NUMBER, ...).
    """
    country_alt = "|".join(sorted(map(re.escape, countries), key=len, reverse=True))
    first_alt = "|".join(FIRST_NAMES)
    return [
        ("URL", r"\bwww\.[a-z0-9]+\.com\b"),
        ("PERSON", rf"\b(?:{first_alt}) Person[0-9]{{6}}\b"),
        ("ORGANIZATION", r"\bOrg[0-9]{3}\b"),
        ("CITY", r"\b[A-Z][A-Z0-9_]*ville\b"),
        ("COUNTRY", rf"\b(?:{country_alt})\b"),
        ("DATE", r"\b(?:19|20)[0-9]{2}\b"),
        ("NUMBER", r"\b[0-9]+\b"),
        ("TITLE", r"\b(?:president|chairman|minister|executive)\b"),
    ]
