"""End-to-end P/R gate vs the frozen reference-semantics oracle (BASELINE.md).

The oracle triple set is derived purely from construction-time ground
truth via DuckDB SQL (sources/oracle_rules.py) — no engine code runs on
that side. Target: precision and recall >= 0.95 on (entity, relation,
slot) matching; we assert exact 1.0 on the synthetic corpus.
"""

from __future__ import annotations

from conftest import SF_DIR


def _triple_key(rows):
    return {(r[0], r[1], r[2], r[3]) for r in rows}


def test_triple_pr_gate(spark, duck):
    from stanford_relation_extractor_spark.plans.pipeline import final_triples
    from stanford_relation_extractor_spark.sources.oracle_rules import final_triples_sql

    got = _triple_key(
        final_triples(spark, SF_DIR)
        .select("entity_name", "entity_type", "relation", "slot_value")
        .collect()
    )
    want = _triple_key(duck.execute(final_triples_sql()).fetchall())
    assert want, "oracle produced no triples — fixture broken"
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.3f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"
    # on the synthetic corpus the match must be exact
    assert precision == 1.0 and recall == 1.0


def test_flagship_entry_runs(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"entity_name", "entity_type", "relation", "slot_value", "score"} <= cols
