"""End-to-end extraction pipeline assembly (SURVEY.md §7 stage graph).

Builds the lazy DataFrame DAG; materialization/checkpointing lives in
sources/sinks.py so each stage boundary can be persisted as an
idempotent, lineage-stamped table (the reference's Postgres caches, S9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.consistency import apply_consistency
from ..operators.ensemble import AGREE_MOST, combine_votes
from ..operators.extractors import extract_votes
from ..operators.linking import canonicalize_names
from ..operators.mentions import detect_mentions
from ..sources.synthetic import (
    CORP_SUFFIXES,
    NICKNAMES,
    country_gazetteer,
    detector_config,
    transcripts_df,
)


def build_stages(
    spark: SparkSession,
    sf_dir: str,
    combination: str = AGREE_MOST,
    transcripts: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The full lazy stage graph over the (synthetic) transcripts table."""
    t = transcripts if transcripts is not None else transcripts_df(spark, sf_dir)
    config = detector_config(country_gazetteer(spark, sf_dir))
    sentences = detect_mentions(t, config)
    votes = extract_votes(sentences)
    # stage 4 LINK: canonicalize surfaces (nickname J6 + suffix strip F5)
    # before grouping, as the reference links before Featurizer grouping.
    linked_votes = canonicalize_names(
        votes, ["entity_name", "slot_value"], NICKNAMES, CORP_SUFFIXES
    )
    candidates = combine_votes(linked_votes, combination=combination)
    triples = apply_consistency(candidates, spark)
    return {
        "transcripts": t,
        "sentences": sentences,
        "votes": votes,
        "linked_votes": linked_votes,
        "candidates": candidates,
        "triples": triples,
    }


def final_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_stages(spark, sf_dir)["triples"]
