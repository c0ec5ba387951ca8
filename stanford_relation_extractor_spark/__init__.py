"""PySpark-native knowledge-graph construction pipeline.

A from-scratch re-expression of the capabilities of
connectthefuture/Stanford_Relation_Extractor (Stanford TAC-KBP
slot-filling) as an idiomatic Spark DataFrame pipeline:

    transcripts -> ORDER -> EXTRACT (mentions) -> PAIR+SCORE (extractor
    votes) -> ENSEMBLE (noisy-or + agreement gate) -> LINK -> CANON
    (connected components) -> CONSIST -> MATERIALIZE

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

__version__ = "0.1.0"
