"""End-to-end extraction pipeline assembly (SURVEY.md §7 stage graph).

Builds the lazy DataFrame DAG; materialization/checkpointing lives in
sources/sinks.py so each stage boundary can be persisted as an
idempotent, lineage-stamped table (the reference's Postgres caches, S9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.consistency import apply_consistency, apply_consistency_greedy
from ..operators.ensemble import AGREE_MOST, combine_votes
from ..operators.extractors import extract_votes, extract_votes_fused
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
    # hot path: sentence split + detection + pairing + extractors fused
    # into one Arrow pass (identical semantics to extract_votes(sentences))
    votes = extract_votes_fused(t, config)
    # stage 4 LINK: canonicalize surfaces (nickname J6 + suffix strip F5)
    # before grouping, as the reference links before Featurizer grouping.
    linked_votes = canonicalize_names(
        votes, ["entity_name", "slot_value"], NICKNAMES, CORP_SUFFIXES
    )
    candidates = combine_votes(linked_votes, combination=combination)
    triples = apply_consistency(candidates, spark, assume_unique=True)
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


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    combination: str = AGREE_MOST,
) -> dict[str, object]:
    """Materialized, resumable execution (SURVEY.md §7 stage graph).

    Each stage lands as a parquet table + lineage manifest under
    ``checkpoint_dir``; re-running after a crash (or with some stages
    deleted) recomputes only invalid stages — the Spark analog of the
    reference's Postgres caches (S9). The final triple store is
    partitioned by relation (S11 predictions.tab analog).
    """
    import os

    from ..sources.sinks import checkpoint_stage, fingerprint, read_manifest

    cfg = {"sf_dir": sf_dir, "combination": combination, "version": 1}

    fp_sent = fingerprint("sentences", cfg, [])
    sentences = checkpoint_stage(
        spark,
        lambda: build_stages(spark, sf_dir, combination)["sentences"],
        os.path.join(checkpoint_dir, "sentences"),
        fp_sent,
    )

    fp_votes = fingerprint("linked_votes", cfg, [fp_sent])
    linked_votes = checkpoint_stage(
        spark,
        lambda: canonicalize_names(
            extract_votes(sentences), ["entity_name", "slot_value"], NICKNAMES, CORP_SUFFIXES
        ),
        os.path.join(checkpoint_dir, "linked_votes"),
        fp_votes,
    )

    fp_cand = fingerprint("candidates", cfg, [fp_votes])
    candidates = checkpoint_stage(
        spark,
        lambda: combine_votes(linked_votes, combination=combination),
        os.path.join(checkpoint_dir, "candidates"),
        fp_cand,
    )

    fp_triples = fingerprint("triples", cfg, [fp_cand])
    triples = checkpoint_stage(
        spark,
        lambda: apply_consistency(candidates, spark),
        os.path.join(checkpoint_dir, "triples"),
        fp_triples,
        partition_by="relation",
    )

    manifests = {
        name: read_manifest(os.path.join(checkpoint_dir, name))
        for name in ("sentences", "linked_votes", "candidates", "triples")
    }
    return {"triples": triples, "manifests": manifests}
