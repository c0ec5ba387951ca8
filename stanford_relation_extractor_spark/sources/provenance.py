"""S2/S8 — provenance-string parsing and KB TSV scans.

* S2: the fork's candidate-sentence TSV carries provenance strings
  ``docId:...:sentIdx:slotSpan:entitySpan`` parsed at
  `stanford-kbp/.../common/SentenceDouble.java:10-29` /
  `SentenceTriple.java:12-36`. Our pipeline carries provenance natively
  as struct columns; this parser exists for ingesting external data in
  the reference's wire format — pure `split`/`regexp_extract` columns,
  no UDF.
* S8: training-KB triples from TSV (`slotfilling/ir/KBPIR.java:165-268`)
  — a `spark.read.csv` with tab separator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# conv_id:turn_idx:sent_idx:eb-ee:sb-se
PROVENANCE_RX = r"^([^:]+):(\d+):(\d+):(\d+)-(\d+):(\d+)-(\d+)$"


def parse_provenance(df: DataFrame, col: str = "provenance_str") -> DataFrame:
    """Add a typed ``provenance`` struct parsed from the wire string."""
    g = lambda i: F.regexp_extract(F.col(col), PROVENANCE_RX, i)  # noqa: E731
    return df.withColumn(
        "provenance",
        F.struct(
            g(1).alias("conv_id"),
            g(2).cast("int").alias("turn_idx"),
            g(3).cast("int").alias("sent_idx"),
            g(4).cast("int").alias("entity_begin"),
            g(5).cast("int").alias("entity_end"),
            g(6).cast("int").alias("slot_begin"),
            g(7).cast("int").alias("slot_end"),
        ),
    )


def format_provenance(df: DataFrame) -> DataFrame:
    """Inverse of ``parse_provenance`` — emit the wire string."""
    return df.withColumn(
        "provenance_str",
        F.concat_ws(
            ":",
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("sent_idx"),
            F.concat_ws("-", F.col("entity_begin"), F.col("entity_end")),
            F.concat_ws("-", F.col("slot_begin"), F.col("slot_end")),
        ),
    )


KB_SCHEMA = "entity_name string, relation string, slot_value string"


def read_kb_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S8: (entity, relation, slotValue) triples from a tab-separated KB."""
    return spark.read.csv(path, sep="\t", schema=KB_SCHEMA, header=False)
