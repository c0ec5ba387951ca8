"""Per-phase isolation benches (guide §1.4 noop-sink discipline).

NOT the driver's bench — bench.py stays frozen. This file exists so
OPTIMIZATION_r06.md can cite phase-level numbers: each e2e phase of the
headline pipeline is timed separately (the spool write, the canon
window, the ensemble, the consistency tail), plus the datapipe
headliners. Run:  python bench_extra.py [phase ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from stanford_relation_extractor_spark.plans.pipeline import build_stages
    from stanford_relation_extractor_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext

    only = set(sys.argv[1:])
    timings: dict[str, list[float]] = {}

    def bench(name: str, fn, repeats: int = REPEATS) -> None:
        if only and name not in only:
            return
        sc.setJobDescription(name)
        samples = []
        for _ in range(repeats):
            t0 = time.monotonic()
            fn()
            samples.append(round(time.monotonic() - t0, 3))
        sc.setJobDescription(None)
        timings[name] = samples
        print(f"{name}: min={min(samples)} samples={samples}", file=sys.stderr)

    # warm the JVM + python workers once
    build_stages(spark, SF_DIR)["transcripts"].count()

    # --- e2e phase isolation (fresh build_stages per repeat where the
    # phase is driver-stateful) -----------------------------------------
    bench("p_transcripts_scan", lambda: force(build_stages(spark, SF_DIR)["transcripts"]))
    bench("p_extract_votes", lambda: force(build_stages(spark, SF_DIR)["votes"]))

    def spool_only():
        st = build_stages(spark, SF_DIR)
        st["votes_cut"]  # parquet spool write + rescan handle

    bench("p_spool_write", spool_only)

    def canon_chain():
        st = build_stages(spark, SF_DIR)
        st["canon_map"]  # spool + surfaces + canon build (driver-local path)

    bench("p_spool_surfaces_canon", canon_chain)

    def e2e():
        force(build_stages(spark, SF_DIR)["triples"])

    bench("p_e2e", e2e)

    # incremental phases on ONE shared build (cheap re-reads of the spool)
    st = build_stages(spark, SF_DIR)
    t0 = time.monotonic()
    st["votes_cut"]
    t1 = time.monotonic()
    st["surfaces"]
    t2 = time.monotonic()
    st["canon_map"]
    t3 = time.monotonic()
    sc.setJobDescription("p_candidates_from_spool")
    force(st["candidates"])
    t4 = time.monotonic()
    sc.setJobDescription("p_alt_names_from_spool")
    force(st["alt_names"])
    t5 = time.monotonic()
    sc.setJobDescription("p_triples_from_spool")
    force(st["triples"])
    t6 = time.monotonic()
    sc.setJobDescription(None)
    timings["incremental"] = [
        round(x, 3)
        for x in (t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4, t6 - t5)
    ]
    print(
        "incremental: spool={} surfaces={} canon={} candidates={} alt={} triples={}".format(
            *timings["incremental"]
        ),
        file=sys.stderr,
    )

    # --- datapipe headliners -------------------------------------------
    from stanford_relation_extractor_spark.datapipe import queries as dq

    bench("q_minhash_lsh", lambda: force(dq.q_minhash_lsh(spark, SF_DIR)))
    bench("q_simhash_neardups", lambda: force(dq.q_simhash_neardups(spark, SF_DIR)))
    bench("q_prefix_block", lambda: force(dq.q_prefix_block_jaccard(spark, SF_DIR)))
    bench("q_knn", lambda: force(dq.q_knn_bruteforce(spark, SF_DIR)))
    bench("q_lsh_knn_banded", lambda: force(dq.q_lsh_knn_banded(spark, SF_DIR)))
    bench("q_language_id", lambda: force(dq.q_language_id(spark, SF_DIR)))
    bench("q_events_sessions", lambda: force(dq.q_events_sessions(spark, SF_DIR)))

    print(json.dumps({k: v for k, v in timings.items()}))


if __name__ == "__main__":
    main()
