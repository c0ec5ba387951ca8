"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The engine under test is ``stanford_relation_extractor_spark``; the
synthetic transcripts corpus is a shared Spark/DuckDB SQL recipe
(sources/synthetic.py), so oracle queries reconstruct the identical
input from the pre-registered parquet views and then assert the
*construction-time ground truth* (sources/oracle_rules.py) — never by
re-running engine code.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_0001 = "/root/testdata/sf0.001"


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.sources.synthetic import transcripts_df

    return transcripts_df(spark, sf_dir).select("conv_id", "turn_idx", "role", "text", "tool")


def _turn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.operators.ordering import with_turn_order
    from stanford_relation_extractor_spark.sources.synthetic import transcripts_df

    return with_turn_order(transcripts_df(spark, sf_dir)).select(
        "conv_id", "turn_idx", "turn_seq", "text"
    )


def _sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    return build_stages(spark, sf_dir)["sentences"].select(
        "conv_id", "turn_idx", "sent_idx", "sent_text"
    )


def _mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    sentences = build_stages(spark, sf_dir)["sentences"]
    m = sentences.select(
        "conv_id", "turn_idx", "sent_idx", F.explode("mentions").alias("m")
    )
    return m.select(
        "conv_id", "turn_idx", "sent_idx",
        F.col("m.surface").alias("surface"),
        F.col("m.ner").alias("ner"),
    )


def _votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    return build_stages(spark, sf_dir)["votes"].select(
        "conv_id", "turn_idx", "entity_name", "entity_type",
        "slot_value", "slot_ner", "relation", "extractor", "score",
    )


def _ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    return build_stages(spark, sf_dir)["candidates"].select(
        "entity_name", "entity_type", "relation", "slot_value", "slot_ner",
        "n_agree", "score",
    )


def _final_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    return build_stages(spark, sf_dir)["triples"].select(
        "entity_name", "entity_type", "relation", "slot_value", "slot_ner",
        "n_agree", "score",
    )


def _wikidict_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.operators.linking import wikidict_link
    from stanford_relation_extractor_spark.sources.synthetic import (
        alias_dict_df,
        turns_base_df,
    )

    mentions = turns_base_df(spark, sf_dir).select(
        F.col("nickperson").alias("surface")
    ).distinct()
    return wikidict_link(mentions, alias_dict_df(spark, sf_dir)).select("surface", "linked")


def _connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.operators.canonicalize import (
        connected_components,
    )
    from stanford_relation_extractor_spark.sources.synthetic import cc_edges_df

    return connected_components(cc_edges_df(spark, sf_dir))


def _topk_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.operators.selection import (
        topk_sentences_per_entity,
    )
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    return topk_sentences_per_entity(build_stages(spark, sf_dir)["sentences"], k=5)


def _ner_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.operators.selection import ner_majority_vote
    from stanford_relation_extractor_spark.plans.pipeline import build_stages

    mentions = (
        build_stages(spark, sf_dir)["sentences"]
        .select(F.explode("mentions").alias("m"))
        .select(F.col("m.surface").alias("surface"), F.col("m.ner").alias("ner"))
    )
    return ner_majority_vote(mentions)


def _nil_padded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stanford_relation_extractor_spark.operators.evaluate import nil_padded_output
    from stanford_relation_extractor_spark.plans.pipeline import build_stages
    from stanford_relation_extractor_spark.sources.synthetic import turns_base_df

    triples = build_stages(spark, sf_dir)["triples"]
    queries_df = (
        turns_base_df(spark, sf_dir)
        .select(F.col("person").alias("entity_name"))
        .distinct()
        .select(
            F.col("entity_name").alias("query_id"),
            "entity_name",
            F.lit("PERSON").alias("entity_type"),
        )
    )
    return nil_padded_output(triples, queries_df, spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline on sf0.001."""
    from stanford_relation_extractor_spark.plans.pipeline import final_triples

    return final_triples(spark, SF_0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_synth": _transcripts,
        "turn_order": _turn_order,
        "sentences": _sentences,
        "mentions": _mentions,
        "extractor_votes": _votes,
        "ensemble_noisy_or": _ensemble,
        "final_triples": _final_triples,
        "wikidict_link": _wikidict_link,
        "connected_components": _connected_components,
        "topk_sentences": _topk_sentences,
        "ner_majority": _ner_majority,
        "nil_padded_output": _nil_padded,
        **_datapipe_queries(),
    }


def _datapipe_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stanford_relation_extractor_spark.datapipe import queries as dq

    return {
        "dedup_exact": dq.q_dedup_exact,
        "minhash_lsh_neardups": dq.q_minhash_lsh,
        "prefix_block_jaccard": dq.q_prefix_block_jaccard,
        "simhash": dq.q_simhash,
        "knn_bruteforce": dq.q_knn_bruteforce,
        "lsh_knn": dq.q_lsh_knn,
        "token_counts": dq.q_token_counts,
        "quality_scores": dq.q_quality,
        "fingerprints": dq.q_fingerprints,
        "language_id": dq.q_language_id,
        "events_tumbling": dq.q_events_tumbling,
        "events_sessions": dq.q_events_sessions,
        "multimodal_features": dq.q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    from stanford_relation_extractor_spark.sources import oracle_rules as orc
    from stanford_relation_extractor_spark.sources.synthetic import (
        oracle_query,
        oracle_query_linking,
    )

    return {
        "transcripts_synth": oracle_query(
            "SELECT conv_id, turn_idx, role, text, tool FROM transcripts"
        ),
        "turn_order": oracle_query(
            "SELECT conv_id, turn_idx, "
            "CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS INT) AS turn_seq, "
            "text FROM transcripts"
        ),
        "sentences": oracle_query(
            "SELECT conv_id, turn_idx, 0 AS sent_idx, main_sent AS sent_text FROM turns_base "
            "UNION ALL "
            "SELECT conv_id, turn_idx, 1 AS sent_idx, 'Thanks for the update .' AS sent_text "
            "FROM turns_base WHERE filler <> ''"
        ),
        "mentions": orc.mentions_sql(),
        "extractor_votes": orc.votes_sql(),
        "ensemble_noisy_or": orc.ensemble_sql(),
        "final_triples": orc.final_triples_sql(),
        "topk_sentences": orc.topk_sentences_sql(),
        "ner_majority": orc.ner_majority_sql(),
        "nil_padded_output": orc.nil_padded_sql(),
        "wikidict_link": oracle_query_linking(
            """
, wmentions AS (SELECT DISTINCT nickperson AS surface FROM turns_base),
cand AS (
  SELECT m.surface, a.canonical, a.link_score,
         row_number() OVER (PARTITION BY m.surface
                            ORDER BY a.link_score DESC, a.canonical ASC) AS rk
  FROM wmentions m JOIN alias_dict a ON lower(m.surface) = a.alias
), agg AS (
  SELECT surface,
         max(CASE WHEN rk = 1 THEN link_score END) AS top1,
         max(CASE WHEN rk = 2 THEN link_score END) AS top2,
         max(CASE WHEN rk = 1 THEN canonical END) AS best
  FROM cand GROUP BY surface
)
SELECT m.surface,
       CASE WHEN top1 >= 0.4 AND (top2 IS NULL OR top1 >= 1.5 * top2)
            THEN best END AS linked
FROM wmentions m LEFT JOIN agg ON m.surface = agg.surface
"""
        ),
        "connected_components": oracle_query_linking(
            """
, cc_nodes AS (
  SELECT src AS node FROM cc_edges UNION SELECT dst FROM cc_edges
), cc_sym AS (
  SELECT src AS a, dst AS b FROM cc_edges UNION SELECT dst, src FROM cc_edges
), walk(node, label) AS (
  SELECT node, node FROM cc_nodes
  UNION
  SELECT s.b, w.label FROM walk w JOIN cc_sym s ON w.node = s.a
)
SELECT node, min(label) AS component FROM walk GROUP BY node
""",
            recursive=True,
        ),
        **__import__(
            "stanford_relation_extractor_spark.datapipe.oracles", fromlist=["ALL"]
        ).ALL,
    }
