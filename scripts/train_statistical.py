"""Train the statistical ensemble member and freeze it as data.

Mirrors the reference's training story (`train/KBPTrainer.java:374-527`
distant supervision -> `classify/JointBayesRelationExtractor.java:429-560`
MIML EM), Spark-first:

* features: the SAME masked pair featurizer inference uses
  (extractors.extract_pair_features -> statistical.pair_feature_list),
  A8 count-thresholded (>=5);
* seed KB: the synthetic corpus's planted pattern/trigger assertions
  (sources/oracle_rules.py) — the stand-in for the reference's KB TSV;
* training: statistical.miml_train — distributed hard-EM over
  (entity, slot) bags with at-least-once pinning; mentions of unlabeled
  bags train the NIL class;
* output: stanford_relation_extractor_spark/models/frozen_statistical.py
  — a literal weight table, committed so engine inference and the
  DuckDB oracle score against identical numbers.

Usage: python scripts/train_statistical.py [sf_dir] [epochs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "stanford_relation_extractor_spark", "models", "frozen_statistical.py",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from stanford_relation_extractor_spark.operators.extractors import (
        extract_pair_features,
    )
    from stanford_relation_extractor_spark.operators.statistical import (
        feature_count_filter,
        miml_train,
    )
    from stanford_relation_extractor_spark.session import get_spark
    from stanford_relation_extractor_spark.sources.oracle_rules import (
        PATTERN_VOTES,
        TRIGGER_VOTES,
    )
    from stanford_relation_extractor_spark.sources.synthetic import (
        country_gazetteer,
        detector_config,
        oracle_query,
        transcripts_df,
    )

    spark = get_spark("train_statistical", cpus=16, shuffle_partitions=16)
    t = transcripts_df(spark, sf_dir)
    config = detector_config(country_gazetteer(spark, sf_dir))

    feats = feature_count_filter(extract_pair_features(t, config))
    feats = feats.localCheckpoint(eager=True)  # reused every EM round

    branches = []
    for k in sorted(PATTERN_VOTES):
        for ecol, scol, rel in sorted(set(PATTERN_VOTES[k]) | set(TRIGGER_VOTES[k])):
            branches.append(
                f"SELECT DISTINCT {ecol} AS entity_name, '{rel}' AS relation, "
                f"{scol} AS slot_value FROM turns_base WHERE k = {k}"
            )
    kb = spark.sql(oracle_query("\nUNION\n".join(branches)))

    weights = miml_train(feats, kb, epochs=epochs)
    by_feature: dict[str, dict[str, float]] = {}
    for r in weights.collect():
        by_feature.setdefault(r["feature"], {})[r["relation"]] = r["weight"]

    lines = [
        '"""Frozen statistical ensemble member (generated — do not edit).',
        "",
        f"Trained by scripts/train_statistical.py on {sf_dir} with",
        f"{epochs} MIML-lite hard-EM epochs over distant-supervision bags;",
        "feature count threshold 5 (A8). Inference: sum weights over the",
        "masked pair features, softmax over sorted relations + NIL",
        "(statistical.softmax_scores), emit type-admissible relations with",
        'p >= extractors.STATISTICAL_MIN_PROB."""',
        "",
        "WEIGHTS: dict[str, dict[str, float]] = {",
    ]
    for f in sorted(by_feature):
        inner = ", ".join(
            f"{rel!r}: {w!r}" for rel, w in sorted(by_feature[f].items())
        )
        lines.append(f"    {f!r}: {{{inner}}},")
    lines.append("}")
    with open(OUT_PATH, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {len(by_feature)} features to {OUT_PATH}")


if __name__ == "__main__":
    main()
