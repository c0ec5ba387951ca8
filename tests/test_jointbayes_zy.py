"""JointBayes z/y two-level decomposition (A7's full architecture,
`classify/JointBayesRelationExtractor.java` — EM :429-560, y features
:~1840-1900, at-least-once initial model :1421-1470, Y_GIVEN_ZSTAR
inference :1996-2090)."""

from __future__ import annotations

import math

MCOLS = (
    "conv_id string, turn_idx int, sent_idx int, entity_name string, "
    "entity_type string, slot_value string, slot_ner string, feature string"
)
BCOLS = "entity_name string, slot_value string, relation string"


def test_y_feature_shapes(spark):
    """extractYFeatures: proposed label -> atleastonce + one cooc per
    OTHER distinct non-NIL z; unproposed label -> none only."""
    from pyspark.sql import functions as F

    from stanford_relation_extractor_spark.operators.statistical import (
        y_features_col,
    )

    df = spark.createDataFrame(
        [(["per:spouse", "per:title"],)], "zs array<string>"
    )
    got = {
        y: df.select(y_features_col(F.lit(y), F.col("zs")).alias("f")).first().f
        for y in ("per:spouse", "per:parents")
    }
    assert got["per:spouse"] == ["atleastonce", "co:s|per:spouse|d|per:title|"]
    assert got["per:parents"] == ["none"]


def test_initial_model_is_at_least_once(spark):
    """setYWeightsForAtLeastOnce: with the +/-10 initial model, any
    z-proposed label scores sigmoid(10) — bag-level at-least-once."""
    from stanford_relation_extractor_spark.operators.statistical import (
        initial_y_weights,
        score_bags_zy,
    )

    z = spark.createDataFrame(
        [("c1", 0, 0, "E", "PERSON", "S", "PERSON", "per:spouse")],
        MCOLS.replace("feature", "z"),
    )
    yw = initial_y_weights(["per:spouse"], spark)
    row = score_bags_zy(z, yw).first()
    assert row.relation == "per:spouse"
    assert abs(row.y_prob - 1.0 / (1.0 + math.exp(-10.0))) < 1e-6


def test_y_training_learns_cooc(spark):
    """Bags where rel_A is KB-confirmed exactly when rel_B co-occurs:
    the trained y table weights co:s|rel_A|d|rel_B| positive, and a
    co-occurring bag outscores an isolated one."""
    from stanford_relation_extractor_spark.operators.statistical import (
        build_y_dataset,
        score_bags_zy,
        train_y_weights,
    )

    def zrow(i, ent, slot, z):
        return ("c%d" % i, i, 0, ent, "PERSON", slot, "PERSON", z)

    rows = []
    # 4 bags with co-occurrence, all positive for rel_A
    for i in range(4):
        rows += [zrow(i, f"P{i}", f"S{i}", "rel_A"), zrow(i, f"P{i}", f"S{i}", "rel_B")]
    # 4 bags where rel_A fires alone, none confirmed
    for i in range(4, 8):
        rows.append(zrow(i, f"P{i}", f"S{i}", "rel_A"))
    z = spark.createDataFrame(rows, MCOLS.replace("feature", "z"))
    bag_labels = spark.createDataFrame(
        [(f"P{i}", f"S{i}", "rel_A") for i in range(4)], BCOLS
    )
    yw = train_y_weights(build_y_dataset(z, bag_labels))
    w = {(r.y_label, r.feature): r.weight for r in yw.collect()}
    assert w[("rel_A", "co:s|rel_A|d|rel_B|")] > 0
    probs = {
        (r.entity_name, r.relation): r.y_prob
        for r in score_bags_zy(z, yw).collect()
    }
    assert probs[("P0", "rel_A")] > probs[("P4", "rel_A")]


def test_miml_train_zy_end_to_end(spark):
    """The full two-level fit on the hard-EM fixture: z weights match
    the single-level trainer (the y layer must not perturb them), the
    final z assignment pins at-least-once, and the supervised bag's
    y-probability beats the NIL bag's absent candidate set."""
    from stanford_relation_extractor_spark.operators.statistical import (
        final_z_assignment,
        miml_train,
        miml_train_zy,
        score_bags_zy,
    )

    features = spark.createDataFrame(
        [
            ("c1", 0, 0, "E", "PERSON", "S", "NUMBER", "ctx_good"),
            ("c1", 1, 0, "E", "PERSON", "S", "NUMBER", "ctx_bad"),
            ("c2", 0, 0, "X", "PERSON", "Y", "NUMBER", "ctx_bad"),
        ],
        MCOLS,
    )
    bag_labels = spark.createDataFrame([("E", "S", "rel_R")], BCOLS)
    zw, yw = miml_train_zy(features, bag_labels, epochs=1)
    base = {
        (r.feature, r.relation): r.weight
        for r in miml_train(features, bag_labels, epochs=1).collect()
    }
    assert {(r.feature, r.relation): r.weight for r in zw.collect()} == base
    assign = {
        (r.conv_id, r.turn_idx): r.z
        for r in final_z_assignment(features, bag_labels, zw).collect()
    }
    assert assign[("c1", 0)] == "rel_R"  # at-least-once pin
    assert assign[("c2", 0)] == "NIL"
    scored = {
        (r.entity_name, r.relation): r.y_prob
        for r in score_bags_zy(
            final_z_assignment(features, bag_labels, zw), yw
        ).collect()
    }
    assert ("E", "rel_R") in scored and ("X", "rel_R") not in scored
    assert scored[("E", "rel_R")] > 0.5
