"""Checkpointed stage tables with lineage manifests (SURVEY.md S9/S11).

The reference caches each stage's output in Postgres keyed tables
(`stanford-kbp/.../common/PostgresUtils.java`, used at
`KBPProcess.java:220-264`) so a crashed run resumes. Our analog: every
stage writes a partitioned parquet (Iceberg in production) table plus a
`_MANIFEST.json` carrying

* the stage **fingerprint** — sha256 over (stage name, config, input
  fingerprints), so any upstream or config change invalidates the
  checkpoint;
* **per-partition lineage metrics** — row count per partition value —
  which double as the skew report (BASELINE.md resumability protocol).

``checkpoint_stage`` is idempotent: a matching manifest short-circuits
recomputation; a missing/stale one rebuilds atomically (write to tmp
dir, rename).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def fingerprint(stage: str, config: dict[str, Any], input_fps: list[str]) -> str:
    payload = json.dumps(
        {"stage": stage, "config": config, "inputs": sorted(input_fps)},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def read_manifest(path: str) -> dict[str, Any] | None:
    try:
        with open(_manifest_path(path)) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def is_valid(path: str, fp: str) -> bool:
    m = read_manifest(path)
    return m is not None and m.get("fingerprint") == fp


def write_stage(
    df: DataFrame,
    path: str,
    fp: str,
    partition_by: str | None = None,
) -> dict[str, Any]:
    """Atomic checkpoint write + manifest with per-partition lineage."""
    tmp = f"{path}.inprogress"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(tmp)

    back = df.sparkSession.read.parquet(tmp)
    if partition_by:
        part_rows = {
            str(r[partition_by]): r["n"]
            for r in back.groupBy(partition_by).agg(F.count("*").alias("n")).collect()
        }
        n_rows = sum(part_rows.values())
    else:
        part_counts = back.groupBy(F.spark_partition_id().alias("pid")).agg(
            F.count("*").alias("n")
        ).collect()
        part_rows = {str(r["pid"]): r["n"] for r in part_counts}
        n_rows = sum(part_rows.values())

    manifest = {
        "fingerprint": fp,
        "row_count": n_rows,
        "partition_rows": part_rows,
        "partition_by": partition_by,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "max_partition_rows": max(part_rows.values(), default=0),
        "skew_ratio": round(
            max(part_rows.values(), default=0)
            / max(n_rows / max(len(part_rows), 1), 1e-9),
            3,
        ),
    }
    with open(_manifest_path(tmp), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)

    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)
    return manifest


def checkpoint_stage(
    spark: SparkSession,
    build: Callable[[], DataFrame],
    path: str,
    fp: str,
    partition_by: str | None = None,
) -> DataFrame:
    """Return the stage table, recomputing only when the fingerprint
    doesn't match the on-disk manifest (idempotent resume)."""
    if not is_valid(path, fp):
        write_stage(build(), path, fp, partition_by)
    return spark.read.parquet(path)
