"""Structured-Streaming smoke: the extraction ops lift to a stream and
produce the same votes as the batch path."""

from __future__ import annotations

import os

from conftest import SF_DIR


def test_streaming_votes_match_batch(spark, tmp_path):
    from stanford_relation_extractor_spark.operators.extractors import (
        extract_votes_fused,
    )
    from stanford_relation_extractor_spark.sources.synthetic import (
        country_gazetteer,
        detector_config,
        transcripts_df,
    )
    from stanford_relation_extractor_spark.streaming.ingest import (
        stream_transcripts,
        streaming_vote_counts,
        write_stream_to_checkpointed_sink,
    )

    src = str(tmp_path / "stream_src")
    t = transcripts_df(spark, SF_DIR).limit(200)
    t.repartition(3).write.parquet(src)

    countries = country_gazetteer(spark, SF_DIR)
    stream = stream_transcripts(spark, src, max_files_per_trigger=1)
    agg = streaming_vote_counts(stream, countries)
    q = write_stream_to_checkpointed_sink(
        agg, "memory:stream_votes", str(tmp_path / "ckpt"), output_mode="complete"
    )
    q.awaitTermination(120)

    got = {
        (r["entity_name"], r["relation"], r["slot_value"], r["extractor"]): (r["n_votes"], r["w"])
        for r in spark.sql("SELECT * FROM stream_votes").collect()
    }
    batch = (
        extract_votes_fused(
            spark.read.parquet(src), detector_config(countries), resolve_pronouns=False
        )
        .groupBy("entity_name", "entity_type", "relation", "slot_value", "extractor")
        .count()
        .collect()
    )
    want_keys = {(r["entity_name"], r["relation"], r["slot_value"], r["extractor"]) for r in batch}
    assert set(got) == want_keys
    assert {n for n, _ in got.values()} == {r["count"] for r in batch} or len(got) == len(batch)
