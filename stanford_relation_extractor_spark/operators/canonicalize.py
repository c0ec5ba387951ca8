"""Stage 5 — graph-based entity merging via connected components (J9).

Re-expresses `stanford-kbp/.../slotfilling/evaluate/GraphConsistencyPostProcessors.java:53-249`
(EntityMergingPostProcessor: merge equivalent entities onto a
representative, rewrite edges) as:

1. an undirected same-entity edge table (produced by the linker cascade
   or supplied directly);
2. hand-rolled deterministic min-label propagation (no GraphFrames
   dependency, SURVEY.md §4): each node repeatedly adopts the minimum
   component id among itself and its neighbors. Converges in
   O(graph diameter) iterations; each iteration is one shuffle join +
   aggregation, localCheckpoint()ed to cut lineage (the classic
   iterative-Spark failure mode at scale).
3. triple rewrite: replace entity by its component representative.

For web-scale graphs the same loop admits the large-star/small-star
optimization; min-label propagation is preferred here because alias
chains are short (diameter <= 3 in the synthetic corpus) and each
round is a plain co-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is treated as undirected; node ids are strings ordered
    lexicographically (deterministic representative selection).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def same_entity_edges(entities: DataFrame) -> DataFrame:
    """J8 at scale: candidate pairs by blocking, scored by the linker
    cascade — never an O(n^2) cross join.

    ``entities``: (entity_name, entity_type) distinct. Pairs are
    generated only within a blocking key (normalized last token + first
    char, `functions/text.py`), then judged by ``same_entity``
    (EntityLinker.java:67-84 cascade) inside an Arrow batch. Output:
    undirected (src, dst) edges for connected components.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.text import blocking_key, same_entity

    def add_block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["block"] = pdf["entity_name"].map(blocking_key)
            yield pdf

    keyed = entities.select("entity_name", "entity_type").mapInPandas(
        add_block, schema="entity_name string, entity_type string, block string"
    ).filter(F.col("block") != "")
    a = keyed.select(
        F.col("entity_name").alias("src"), F.col("entity_type").alias("et"), "block"
    )
    b = keyed.select(
        F.col("entity_name").alias("dst"),
        F.col("entity_type").alias("et_b"),
        F.col("block").alias("block_b"),
    )
    pairs = a.join(
        b,
        (F.col("block") == F.col("block_b"))
        & (F.col("et") == F.col("et_b"))
        & (F.col("src") < F.col("dst")),
    ).select("src", "dst", "et")

    def judge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = [
                same_entity(s, d, t)
                for s, d, t in zip(pdf["src"], pdf["dst"], pdf["et"])
            ]
            yield pdf[pd.Series(mask, index=pdf.index)][["src", "dst"]]

    return pairs.mapInPandas(judge, schema="src string, dst string")


def canonicalize_entities(triples: DataFrame, entities: DataFrame | None = None) -> DataFrame:
    """Full stage-5: blocking pairs -> cascade edges -> connected
    components -> rewrite entity_name to the component representative."""
    ents = (
        entities
        if entities is not None
        else triples.select("entity_name", "entity_type").distinct()
    )
    comps = connected_components(same_entity_edges(ents))
    return rewrite_with_components(triples, comps)


def rewrite_with_components(
    triples: DataFrame, components: DataFrame, col: str = "entity_name"
) -> DataFrame:
    """Replace ``col`` with its component representative (left join —
    nodes outside the merge graph keep their name)."""
    comp = components.select(
        F.col("node").alias("_n"), F.col("component").alias("_c")
    )
    return (
        triples.join(comp, triples[col] == F.col("_n"), "left")
        .withColumn(col, F.coalesce(F.col("_c"), F.col(col)))
        .drop("_n", "_c")
    )
