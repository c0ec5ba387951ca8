"""Checkpoint/resume idempotency (BASELINE.md resumability protocol)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ckpt"))


def _mtimes(root):
    out = {}
    for stage in os.listdir(root):
        mpath = os.path.join(root, stage, "_MANIFEST.json")
        if os.path.exists(mpath):
            out[stage] = os.path.getmtime(mpath)
    return out


def test_pipeline_checkpoints_and_resumes(spark, ckpt):
    from stanford_relation_extractor_spark.plans.pipeline import run_pipeline

    out1 = run_pipeline(spark, SF_DIR, ckpt)
    n1 = out1["triples"].count()
    assert n1 > 0
    m = out1["manifests"]
    assert all(m[s] is not None for s in ("sentences", "linked_votes", "candidates", "triples"))
    assert m["triples"]["row_count"] == n1
    assert m["triples"]["partition_by"] == "relation"
    assert len(m["triples"]["partition_rows"]) > 5  # per-partition lineage present
    t1 = _mtimes(ckpt)

    # second run: everything valid -> nothing recomputed
    out2 = run_pipeline(spark, SF_DIR, ckpt)
    assert out2["triples"].count() == n1
    assert _mtimes(ckpt) == t1

    # kill/restart at a stage boundary: drop a late stage only
    shutil.rmtree(os.path.join(ckpt, "candidates"))
    shutil.rmtree(os.path.join(ckpt, "triples"))
    out3 = run_pipeline(spark, SF_DIR, ckpt)
    t3 = _mtimes(ckpt)
    assert out3["triples"].count() == n1
    assert t3["sentences"] == t1["sentences"]  # early stages untouched
    assert t3["linked_votes"] == t1["linked_votes"]
    assert t3["candidates"] != t1["candidates"]  # late stages rebuilt


def test_config_change_invalidates(spark, ckpt):
    from stanford_relation_extractor_spark.plans.pipeline import run_pipeline

    t_before = _mtimes(ckpt)
    out = run_pipeline(spark, SF_DIR, ckpt, combination="AGREE_TWO")
    t_after = _mtimes(ckpt)
    # sentence stage config-independent of the gate? It isn't: cfg hash
    # covers all stages, so everything rebuilds under a new combination.
    assert t_after["candidates"] != t_before["candidates"]
    assert out["triples"].count() > 0


def test_partition_values_roundtrip_special_chars(spark, ckpt):
    """relation names contain ':' and '/'; partitioned write must
    escape and restore them losslessly."""
    from stanford_relation_extractor_spark.plans.pipeline import run_pipeline

    out = run_pipeline(spark, SF_DIR, ckpt)
    rels = {r["relation"] for r in out["triples"].select("relation").distinct().collect()}
    assert any(":" in r for r in rels)
    assert "org:top_members/employees" in rels or all("/" not in r for r in rels)


def test_extraction_runs_exactly_once(spark, tmp_path, monkeypatch):
    """VERDICT r2 #1: the resumable path must run the (most expensive)
    Arrow extraction ONCE per fresh build — the canon-map, rewrite and
    alternate-name stages all read the checkpointed votes table."""
    from stanford_relation_extractor_spark.plans import pipeline as P

    calls = []
    real = P.extract_votes

    def counted(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(P, "extract_votes", counted)
    ckpt2 = str(tmp_path / "ckpt_once")
    out = P.run_pipeline(spark, SF_DIR, ckpt2)
    assert out["triples"].count() > 0
    assert out["manifests"]["votes"] is not None
    assert len(calls) == 1
    # resume: nothing recomputed, extraction not re-invoked
    P.run_pipeline(spark, SF_DIR, ckpt2)
    assert len(calls) == 1


def test_manifest_skew_metrics(spark, ckpt):
    from stanford_relation_extractor_spark.plans.pipeline import run_pipeline

    m = run_pipeline(spark, SF_DIR, ckpt)["manifests"]["triples"]
    assert m["skew_ratio"] >= 1.0
    assert m["max_partition_rows"] <= m["row_count"]
    assert sum(m["partition_rows"].values()) == m["row_count"]
