"""Stage 0 — stable ordering + the north-rule per-turn text invariant."""

from __future__ import annotations

from conftest import SF_DIR


def test_turn_idx_contiguous(spark):
    from stanford_relation_extractor_spark.operators.ordering import ordering_violations
    from stanford_relation_extractor_spark.sources.synthetic import transcripts_df

    t = transcripts_df(spark, SF_DIR)
    assert ordering_violations(t).count() == 0


def test_text_equality_roundtrip(spark):
    """Per-turn text equality under stable ordering after a full shuffle."""
    from stanford_relation_extractor_spark.operators.ordering import turn_text_mismatches
    from stanford_relation_extractor_spark.sources.synthetic import transcripts_df

    t = transcripts_df(spark, SF_DIR)
    shuffled = t.repartition(16, "text")  # scramble physical layout
    assert turn_text_mismatches(t, shuffled).count() == 0


def test_hot_conversation_skew_present(spark):
    """The corpus must exercise skew: hot conv >> median conv size."""
    from pyspark.sql import functions as F

    from stanford_relation_extractor_spark.sources.synthetic import transcripts_df

    sizes = (
        transcripts_df(spark, SF_DIR).groupBy("conv_id").count().orderBy(F.desc("count"))
    )
    top = sizes.first()["count"]
    med = sizes.approxQuantile("count", [0.5], 0.01)[0]
    assert top > 5 * med
