"""Stage 5 — graph-based entity merging via connected components (J9).

Re-expresses `stanford-kbp/.../slotfilling/evaluate/GraphConsistencyPostProcessors.java:53-249`
(EntityMergingPostProcessor: merge equivalent entities onto a
representative, rewrite edges) as:

1. an undirected same-entity edge table (produced by the linker cascade
   or supplied directly);
2. deterministic connected components (no GraphFrames dependency,
   SURVEY.md §4) with TWO interchangeable algorithms behind one
   signature:
   * ``algorithm="label"`` — min-label propagation: each node adopts
     the minimum component id among itself and its neighbors.
     O(diameter) rounds of one co-partitioned join each — the right
     choice for alias/link chains (diameter <= 3 on transcripts).
   * ``algorithm="star"`` — alternating large-star/small-star
     contraction (Kiveris et al., "Connected Components in MapReduce
     and Beyond"): O(log^2 n) rounds regardless of diameter — the
     scale path for adversarial graphs (long chains, giant
     components).
   Lineage is cut every ``checkpoint_every`` rounds; with a
   ``checkpoint_dir`` the cut is a *reliable* ``checkpoint()`` (HDFS/
   object-store) so executor loss mid-computation cannot kill the job
   — ``localCheckpoint`` (executor-local) is only the sandbox default.
3. triple rewrite: replace entity by its component representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lineage_cut(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    if checkpoint_dir is not None:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() != checkpoint_dir:
            sc.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    algorithm: str = "label",
    check_every: int = 1,
    checkpoint_every: int = 1,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is treated as undirected; node ids are strings ordered
    lexicographically (deterministic representative selection).
    ``check_every`` batches the convergence-test action (each test is a
    driver round-trip); ``checkpoint_every``/``checkpoint_dir`` control
    lineage cuts (see module docstring).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if algorithm == "star":
        return _cc_star(sym, max_iter, checkpoint_every, checkpoint_dir)
    if algorithm != "label":
        raise ValueError(f"unknown connected-components algorithm {algorithm!r}")

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = _lineage_cut(labels, checkpoint_dir)
    sym = _lineage_cut(sym, checkpoint_dir)

    for it in range(max_iter):
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
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            new_labels = _lineage_cut(new_labels, checkpoint_dir)
        do_check = (it + 1) % check_every == 0 or it == max_iter - 1
        if do_check:
            changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if do_check and changed == 0:
            break
    return labels


def _cc_star(
    sym: DataFrame,
    max_iter: int,
    checkpoint_every: int,
    checkpoint_dir: str | None,
) -> DataFrame:
    """Alternating large-star/small-star rounds until the edge set is a
    fixpoint (a forest of stars centered at component minima).

    Each round is two join+agg passes over the current edge set; one
    tiny agg action per round tests the fixpoint via a deterministic
    (count, xor-free hash-sum) signature.
    """
    nodes = sym.select(F.col("a").alias("node")).distinct()
    nodes = _lineage_cut(nodes, checkpoint_dir)
    e = _lineage_cut(sym, checkpoint_dir)
    prev_sig = None
    for it in range(max_iter):
        # large-star: attach every strictly-larger neighbor of u to
        # m(u) = min(N(u) ∪ {u})
        s = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mn = s.groupBy("a").agg(F.min("b").alias("_mb"))
        mn = mn.select("a", F.least(F.col("_mb"), F.col("a")).alias("m"))
        e1 = (
            s.join(mn, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: attach every smaller-or-equal neighbor (and u) to
        # m(u) = min(N<=(u) ∪ {u})
        s1 = e1.union(e1.select(F.col("b").alias("a"), F.col("a").alias("b")))
        smaller = s1.filter(F.col("b") < F.col("a"))
        mn2 = smaller.groupBy("a").agg(F.min("b").alias("m"))
        e2 = (
            smaller.join(mn2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mn2.select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        if (it + 1) % checkpoint_every == 0 or it == max_iter - 1:
            e2 = _lineage_cut(e2, checkpoint_dir)
        sig = tuple(
            e2.agg(
                F.count("*").alias("n"), F.sum(F.hash("a", "b")).alias("h")
            ).collect()[0]
        )
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig
    # star edges point node -> center; centers / isolated nodes label themselves
    centers = e.groupBy(F.col("a").alias("node")).agg(F.min("b").alias("_c"))
    return nodes.join(centers, "node", "left").select(
        "node", F.coalesce(F.col("_c"), F.col("node")).alias("component")
    )


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
