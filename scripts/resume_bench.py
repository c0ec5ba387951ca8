"""Fused vs checkpointed-pipeline cost (VERDICT r3 task 7).

Measures, at bench scale on one local[N] session:

* **fused** — `build_stages(...)["triples"]` forced with a noop write:
  the in-session hot path (single Arrow pass, parquet spool).
* **checkpointed cold** — `run_pipeline(...)` into a fresh checkpoint
  dir: every stage lands as parquet + lineage manifest (the resumable
  path; extraction runs once as the `votes` stage).
* **checkpointed resume** — `run_pipeline(...)` again over the same
  dir: all fingerprints valid, so the cost is pure stage validation +
  re-open (the crash-recovery bill).

Usage: python scripts/resume_bench.py [sf_dir] [cpus]
Prints one JSON line; BENCH/BASELINE.md records the numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from stanford_relation_extractor_spark.plans import pipeline as P
    from stanford_relation_extractor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("resume_bench", cpus=cpus, shuffle_partitions=cpus)

    n = P.build_stages(spark, sf_dir)["transcripts"].count()

    def fused() -> float:
        t0 = time.monotonic()
        P.build_stages(spark, sf_dir)["triples"].write.format("noop").mode(
            "overwrite"
        ).save()
        P._cleanup_spools()
        return round(time.monotonic() - t0, 3)

    fused_first = fused()
    fused_steady = min(fused(), fused())

    ckpt = tempfile.mkdtemp(prefix="resume_bench_")
    try:
        t0 = time.monotonic()
        out = P.run_pipeline(spark, sf_dir, ckpt)
        out["triples"].write.format("noop").mode("overwrite").save()
        cold = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        out = P.run_pipeline(spark, sf_dir, ckpt)
        out["triples"].write.format("noop").mode("overwrite").save()
        resume = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    print(json.dumps({
        "metric": "fused_vs_checkpointed_e2e_sec",
        "sf_dir": sf_dir,
        "turns": n,
        "cpus": cpus,
        "fused_first_sec": fused_first,
        "fused_steady_sec": fused_steady,
        "checkpointed_cold_sec": cold,
        "checkpointed_resume_sec": resume,
        "checkpoint_overhead_x": round(cold / fused_steady, 2) if fused_steady else None,
    }))


if __name__ == "__main__":
    main()
