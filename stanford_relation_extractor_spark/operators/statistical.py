"""Statistical relation extractor — the trained-classifier member of the
ensemble (SURVEY.md A6/A8/F8, §2i `score_statistical`).

Re-expresses the shape of
`stanford-kbp/.../slotfilling/classify/OneVsAllRelationExtractor.java:77-140`:
per-mention features -> linear scores against a broadcast weight matrix
-> softmax over relations (`RelationClassifier.java:109-115`, gamma=1)
-> at-least-once max-pool per (entity, relation, slot) group. Training
is a Spark-side frequency-based weight estimation (the MIML JointBayes
EM of the reference is out of scope; the inference surface is what the
ensemble consumes).

* ``featurize_pairs`` — the surface-feature subset of
  `FeatureFactory.createDatum` (`process/FeatureFactory.java:171-972`):
  arg order, NER-type pair, between-words unigrams, surface distance
  bins, adjacent words. Dependency-path features are re-expressed as
  between-span token paths (documented stand-in, SURVEY.md F12).
* ``feature_count_filter`` — A8: drop features with corpus frequency
  < 5 (`Props.featureCountThreshold`, `common/Props.java:227`).
* ``train_weights`` / ``score_statistical`` — per-relation log-odds
  weights from labeled pairs; inference via numpy inside an
  Arrow-batched UDF.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COUNT_THRESHOLD = 5  # common/Props.java:227


def _pair_features(
    sent: str, eb: int, ee: int, sb: int, se: int, et: str, sn: str,
    clusters: dict[str, int] | None = None,
) -> list[str]:
    """Surface features for one (entity, slot) pair in a sentence."""
    order = "e_before_s" if eb < sb else "s_before_e"
    lo, hi = (ee, sb) if eb < sb else (se, eb)
    between = sent[lo:hi].strip().split() if hi > lo else []
    dist_bin = "adj" if len(between) == 0 else ("near" if len(between) <= 3 else "far")
    feats = [
        f"arg_order:{order}",
        f"type_pair:{et}:{sn}",
        f"dist_bin:{dist_bin}",
    ]
    feats.extend(f"between:{w.lower()}" for w in between[:8])
    if between:
        feats.append(f"between_path:{'_'.join(w.lower() for w in between[:4])}")
    if clusters:
        # F13 word-cluster features (FeatureFactory.java:65-76; the
        # reference's Brown-cluster file egw4-reut.512.clusters) — the
        # cluster map is a broadcast dict
        for w in between[:8]:
            c = clusters.get(w.lower())
            if c is not None:
                feats.append(f"between_cluster:{c}")
    return feats


def featurize_pairs(
    votes_or_pairs: DataFrame,
    sentences: DataFrame,
    clusters: dict[str, int] | None = None,
) -> DataFrame:
    """(pair key cols, feature) long table from sentence rows + spans."""
    pairs = votes_or_pairs.select(
        "conv_id", "turn_idx", "sent_idx",
        "entity_name", "entity_type", "entity_begin", "entity_end",
        "slot_value", "slot_ner", "slot_begin", "slot_end",
    ).distinct()
    joined = pairs.join(
        sentences.select("conv_id", "turn_idx", "sent_idx", "sent_text"),
        ["conv_id", "turn_idx", "sent_idx"],
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for f in _pair_features(
                    r.sent_text, r.entity_begin, r.entity_end,
                    r.slot_begin, r.slot_end, r.entity_type, r.slot_ner,
                    clusters,
                ):
                    rows.append(
                        (r.conv_id, r.turn_idx, r.sent_idx, r.entity_name,
                         r.entity_type, r.slot_value, r.slot_ner, f)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "sent_idx", "entity_name",
                    "entity_type", "slot_value", "slot_ner", "feature",
                ],
            )

    return joined.mapInPandas(
        run,
        schema=(
            "conv_id string, turn_idx int, sent_idx int, entity_name string, "
            "entity_type string, slot_value string, slot_ner string, feature string"
        ),
    )


def feature_count_filter(features: DataFrame, threshold: int = FEATURE_COUNT_THRESHOLD) -> DataFrame:
    """A8: keep features appearing >= threshold times (semi join against
    the groupBy-count survivor set — shrinks the broadcast weight matrix)."""
    frequent = (
        features.groupBy("feature")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= threshold)
        .select("feature")
    )
    return features.join(F.broadcast(frequent), "feature", "left_semi")


def training_labels(
    pairs: DataFrame, kb: DataFrame, negative_subsample_mod: int = 0
) -> DataFrame:
    """A9 — distant-supervision label computation
    (`stanford-kbp/.../slotfilling/train/KBPTrainer.java:374-527`):

    * positive: the KB holds (entity, rel, slotValue) for the pair;
    * negative: the KB holds rel for the entity with a DIFFERENT slot
      value and rel is SINGLE-cardinality (the observed fill contradicts
      the known one);
    * unknown otherwise (dropped from training).

    Optional deterministic negative subsampling keeps every Nth negative
    (`train.negatives.subsampleratio`, `common/Props.java:238` — we use
    a hash-mod rather than RNG for reproducibility).
    """
    from ..ontology import RELATION_BY_NAME

    singles = [n for n, r in RELATION_BY_NAME.items() if r.cardinality == "SINGLE"]
    pos = (
        pairs.join(
            kb.select("entity_name", "relation", "slot_value").distinct(),
            ["entity_name", "slot_value"],
        )
        .withColumn("label", F.lit("positive"))
    )
    kb_rel = kb.select(
        "entity_name", F.col("relation").alias("kb_rel"),
        F.col("slot_value").alias("kb_slot"),
    ).filter(F.col("kb_rel").isin(*singles)).distinct()
    neg = (
        pairs.join(kb_rel, "entity_name")
        .filter(F.col("slot_value") != F.col("kb_slot"))
        .select(*pairs.columns, F.col("kb_rel").alias("relation"))
        .withColumn("label", F.lit("negative"))
    )
    if negative_subsample_mod > 1:
        neg = neg.filter(
            F.pmod(F.hash("entity_name", "slot_value", "relation"), F.lit(negative_subsample_mod)) == 0
        )
    return pos.unionByName(neg, allowMissingColumns=True)


def train_weights(labeled_features: DataFrame) -> dict[str, dict[str, float]]:
    """feature -> relation -> log-odds weight, from (feature, relation)
    counts — a naive-Bayes-flavored stand-in for the reference's LR fit
    (distributed count aggregation; only the tiny weight table hits the
    driver for broadcast)."""
    counts = (
        labeled_features.groupBy("feature", "relation").agg(F.count("*").alias("n"))
    ).collect()
    totals: dict[str, int] = {}
    for r in counts:
        totals[r["feature"]] = totals.get(r["feature"], 0) + r["n"]
    weights: dict[str, dict[str, float]] = {}
    for r in counts:
        w = math.log((r["n"] + 0.5) / (totals[r["feature"]] - r["n"] + 0.5))
        weights.setdefault(r["feature"], {})[r["relation"]] = round(w, 6)
    return weights


def score_statistical(
    features: DataFrame,
    weights: dict[str, dict[str, float]],
    relations: list[str],
    gamma: float = 1.0,
    extractor_name: str = "statistical",
) -> DataFrame:
    """Per-pair relation distribution: sum feature weights per relation,
    softmax rescale (RelationClassifier.java:109-115), emit vote rows.

    The weight table is broadcast by closure; scoring is pure numpy over
    Arrow batches.
    """
    import numpy as np

    rel_idx = {rel: i for i, rel in enumerate(relations)}
    pair_key = [
        "conv_id", "turn_idx", "sent_idx", "entity_name", "entity_type",
        "slot_value", "slot_ner",
    ]
    grouped = features.groupBy(*pair_key).agg(
        F.collect_list("feature").alias("feats")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                scores = np.zeros(len(relations))
                for f in r.feats:
                    for rel, w in weights.get(f, {}).items():
                        i = rel_idx.get(rel)
                        if i is not None:
                            scores[i] += w
                e = np.exp(gamma * (scores - scores.max()))
                probs = e / e.sum()
                for rel, p in zip(relations, probs):
                    if p > 1e-6:
                        rows.append(
                            (r.conv_id, r.turn_idx, r.sent_idx, r.entity_name,
                             r.entity_type, r.slot_value, r.slot_ner, rel,
                             extractor_name, round(float(p), 6))
                        )
            yield pd.DataFrame(
                rows,
                columns=pair_key + ["relation", "extractor", "score"],
            )

    return grouped.mapInPandas(
        run,
        schema=(
            "conv_id string, turn_idx int, sent_idx int, entity_name string, "
            "entity_type string, slot_value string, slot_ner string, "
            "relation string, extractor string, score double"
        ),
    )
