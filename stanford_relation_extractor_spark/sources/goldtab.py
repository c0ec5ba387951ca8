"""TAC-KBP assessment-file ("gold") parsing — the reference's official
evaluation input (`evaluate/GoldResponseSet.java:396-423` grok2013;
data shipped at `edu/stanford/nlp/kbp/evaluation_results/2013.dir/*`).

2013 line format: 12 tab-separated fields —
``[0]`` judgment line id, ``[1]`` ``QUERYID:ns:relation`` (query id is
everything before the FIRST colon), ``[2]`` doc id, ``[3]`` slot value,
``[4..9]`` offset spans (unused for set-level scoring), ``[10]``
judgment letter (C correct / X inexact / R redundant / W wrong;
I = ignore, the line is dropped), ``[11]`` equivalence-class id.

Everything is declarative column splitting (no Python row loop) — a
real assessment file is tiny next to the corpus, but the same parse
works on millions of crowd judgments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

JUDGMENTS = ("C", "X", "R", "W")  # CustomSFScore constants; 'I' dropped


def parse_gold_tab(lines: DataFrame, column: str = "value") -> DataFrame:
    """(line_id, query_id, relation, docid, slot_value, judgment,
    equiv_class) from a one-string-column DataFrame of 2013.tab lines
    (``spark.read.text`` shape). Lines without exactly 12 fields and
    'I'-judged lines are dropped, mirroring grok2013's guard."""
    f = F.split(F.col(column), "\t")
    qrel = F.element_at(f, 2)
    split2 = lines.filter(F.size(f) == 12).select(
        F.element_at(f, 1).cast("int").alias("line_id"),
        qrel.alias("_qrel"),
        F.trim(F.element_at(f, 3)).alias("docid"),
        F.trim(F.element_at(f, 4)).alias("slot_value"),
        F.element_at(f, 11).alias("judgment"),
        F.element_at(f, 12).cast("int").alias("equiv_class"),
    )
    # query id / relation / docid / slot value are .trim()ed exactly as
    # grok2013 does — real assessment files carry stray whitespace
    out = split2.select(
        "line_id",
        F.trim(F.substring_index(F.col("_qrel"), ":", 1)).alias("query_id"),
        # relation = everything after the FIRST colon ("ns:relation")
        F.trim(F.expr("substring(_qrel, instr(_qrel, ':') + 1)")).alias("relation"),
        "docid",
        "slot_value",
        "judgment",
        "equiv_class",
    )
    return out.filter(F.col("judgment") != "I")


def format_gold_tab(triples: DataFrame) -> DataFrame:
    """Inverse of ``parse_gold_tab`` for fixture generation: format
    (entity_name, relation, slot_value) triples as C-judged 2013.tab
    lines (query id = entity name; spans are placeholders; equivalence
    class = dense rank of the slot within its (entity, relation))."""
    w = Window.partitionBy("entity_name", "relation").orderBy("slot_value")
    w_id = Window.orderBy("entity_name", "relation", "slot_value")
    rows = triples.select("entity_name", "relation", "slot_value").distinct()
    return rows.select(
        F.concat_ws(
            "\t",
            F.row_number().over(w_id).cast("string"),
            F.concat_ws(":", F.col("entity_name"), F.col("relation")),
            F.concat(F.lit("DOC_"), F.row_number().over(w_id).cast("string")),
            F.col("slot_value"),
            F.lit("0-0"), F.lit("0-0"), F.lit("0-0"),
            F.lit("C"), F.lit("C"), F.lit("C"),
            F.lit("C"),
            F.dense_rank().over(w).cast("string"),
        ).alias("value")
    )


def gold_to_pr_frame(
    gold: DataFrame, queries: DataFrame | None = None
) -> DataFrame:
    """Reduce parsed assessments to the (entity_name, relation,
    slot_value, equiv_class) frame ``pr_score``/``pr_curve`` consume:
    keep CORRECT judgments only (CustomSFScore counts X/R separately;
    set-level P/R uses C), resolve query ids to entity names via the
    optional ``queries`` table (query_id, entity_name) — the task-XML
    query map (S7). Without it the query id IS the entity name."""
    g = gold.filter(F.col("judgment") == "C")
    if queries is not None:
        g = (
            g.join(F.broadcast(queries.select("query_id", "entity_name")), "query_id")
        )
    else:
        g = g.withColumn("entity_name", F.col("query_id"))
    return g.select("entity_name", "relation", "slot_value", "equiv_class").distinct()
