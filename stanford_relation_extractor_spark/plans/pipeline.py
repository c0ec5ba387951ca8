"""End-to-end extraction pipeline assembly (SURVEY.md §7 stage graph).

Builds the lazy DataFrame DAG; materialization/checkpointing lives in
sources/sinks.py so each stage boundary can be persisted as an
idempotent, lineage-stamped table (the reference's Postgres caches, S9).

Stage 4/5 (LINK + CANON) is the reference's flagship entity-merging
path (`evaluate/GraphConsistencyPostProcessors.java:53-249`): distinct
vote surfaces -> dictionary rewrites + wikidict margin links +
same-entity cascade edges -> connected components -> representative
rewrite of the vote stream, plus alternate-name emission
(`evaluate/AlternateNamesExtractor.java`). Canonicalization performs
Spark actions (iterative CC with lineage cuts), so canon-dependent
stages are built lazily on first access.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.canonicalize import (
    build_canon_map,
    emit_alternate_names,
    rewrite_votes,
    vote_surfaces,
)
from ..operators.consistency import apply_consistency
from ..operators.ensemble import AGREE_MOST, combine_votes
from ..operators.extractors import extract_votes, extract_votes_fused
from ..operators.mentions import detect_mentions
from ..sources.synthetic import (
    CORP_SUFFIXES,
    NICKNAMES,
    alias_dict_df,
    country_gazetteer,
    detector_config,
    transcripts_df,
)


# Live spool scratch directories, reaped at interpreter exit (long
# sessions would otherwise leak one dir per build_stages call — on
# /dev/shm in the bench config, i.e. RAM).
_SPOOL_DIRS: list[str] = []


def _cleanup_spools() -> None:
    import shutil

    while _SPOOL_DIRS:
        shutil.rmtree(_SPOOL_DIRS.pop(), ignore_errors=True)


def _sweep_dead_spools(scratch: str) -> None:
    """Remove spool dirs left by sessions that died without atexit
    (SIGTERM/SIGKILL): the owning pid is in the dir name — if that
    process is gone, its spool is garbage."""
    import os
    import re
    import shutil

    rx = re.compile(r"^spark_graft(\d+)_")
    try:
        entries = os.listdir(scratch)
    except OSError:
        return
    for e in entries:
        m = rx.match(e)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)  # raises if the pid is gone
        except ProcessLookupError:
            shutil.rmtree(os.path.join(scratch, e), ignore_errors=True)
        except OSError:
            pass


def _parquet_spool(df: DataFrame, spark: SparkSession, name: str) -> DataFrame:
    """Materialize an intermediate table as compressed parquet scratch
    and hand back a fresh scan — the in-session analog of
    run_pipeline's checkpoint_stage (columnar, off-heap via the page
    cache, codegen-scannable), without the block-manager heap cost."""
    import atexit
    import os
    import tempfile

    # SPARK_GRAFT_SCRATCH points spools at fast scratch (e.g. /dev/shm
    # on the single-disk sandbox — a stand-in for the per-executor NVMe
    # a real cluster gives each shuffle/spill dir). The pid in the
    # prefix makes a SIGKILLed session's leftovers (atexit never ran)
    # attributable and safely sweepable by the next session.
    # Default: /dev/shm when present (guide §6 — the spool is re-scanned
    # 3x within one run; RAM-backed scratch removes the disk round-trip),
    # else the system tmpdir. Env always wins.
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH")
    if scratch is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        scratch = "/dev/shm"
    if not _SPOOL_DIRS:
        atexit.register(_cleanup_spools)
        _sweep_dead_spools(scratch or tempfile.gettempdir())
    d = tempfile.mkdtemp(
        prefix=f"spark_graft{os.getpid()}_{name}_", dir=scratch
    )
    _SPOOL_DIRS.append(d)
    df.write.mode("overwrite").parquet(d)
    return spark.read.parquet(d)


def _surfaces_cut(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Materialize the surface set once for its >=3 consumers.

    Under the canon size gate the set is pulled to the driver as ONE
    Arrow transfer and re-parallelized (tiny table — the canon probe
    and the alternate-name join then cost microseconds); beyond the
    gate it localCheckpoints as before. Replaces a 1.3s spool-rescan
    checkpoint job + separate probe job with a single job at sandbox
    scale, with no behavior change beyond the gate.
    """
    from ..operators.canonicalize import _canon_local_max

    gate = _canon_local_max()
    if gate > 0:
        pdf = df.limit(gate + 1).toPandas()
        if len(pdf) <= gate:
            return spark.createDataFrame(pdf, df.schema)
    return df.localCheckpoint(eager=True)


class LazyStages(dict):
    """Stage dict whose missing keys are built (and memoized) on first
    access — canonicalization runs Spark actions, so building it at
    graph-construction time would charge every caller for it."""

    def __init__(self, eager: dict, builders: dict[str, Callable[[], DataFrame]]):
        super().__init__(eager)
        self._builders = builders

    def __getitem__(self, key):  # noqa: D105
        if not super().__contains__(key) and key in self._builders:
            self[key] = self._builders[key]()
        return super().__getitem__(key)

    def __contains__(self, key):  # noqa: D105
        return super().__contains__(key) or key in self._builders


def build_stages(
    spark: SparkSession,
    sf_dir: str,
    combination: str = AGREE_MOST,
    transcripts: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The full lazy stage graph over the (synthetic) transcripts table."""
    t = transcripts if transcripts is not None else transcripts_df(spark, sf_dir)
    config = detector_config(country_gazetteer(spark, sf_dir))
    sentences = detect_mentions(t, config)
    # hot path: sentence split + detection + pairing + extractors fused
    # into one Arrow pass (identical semantics to extract_votes(sentences))
    votes = extract_votes_fused(t, config)

    stages: LazyStages = LazyStages({}, {})
    builders: dict[str, Callable[[], DataFrame]] = {
        # one materialization of the extraction scan — the
        # canonicalization actions AND the ensemble-bound rewrite both
        # reuse the spooled vote table instead of re-running the Arrow
        # extraction. The spool is a PARQUET round-trip, not
        # localCheckpoint: block-manager storage of tens of millions of
        # deserialized rows bloats the shared local-mode heap and the
        # following stage pays a GC storm that grows with thread count
        # (measured: the ensemble's first run at local[32] was 10-20x
        # slower with checkpoint blocks resident; columnar spool keeps
        # the heap flat and the re-scan in whole-stage codegen).
        # The spool keeps the 14 RAW narrow columns — a measured
        # negative result pinned this (BENCH/BASELINE.md r5):
        # collapsing the 7 provenance columns into the sortable
        # _vote_key string BEFORE the spool shrank the schema to 8
        # columns but grew the parquet bytes 300MB -> 1.1GB at x128
        # (the high-cardinality concat defeats dictionary encoding)
        # and made the 4N ensemble tail GC-bound on string decode
        # (32s -> 103s best). The key is instead computed inside the
        # ensemble scan's codegen stage (combine_votes) and never
        # stored.
        "votes_cut": lambda: _parquet_spool(votes, spark, "votes"),
        # materialized: the surface set feeds the dictionary-edge,
        # wikidict, cascade AND alternate-name branches — one tiny cut
        # beats re-scanning the vote spool per branch
        "surfaces": lambda: _surfaces_cut(vote_surfaces(stages["votes_cut"]), spark),
        "canon_map": lambda: build_canon_map(
            stages["surfaces"], alias_dict_df(spark, sf_dir), NICKNAMES, CORP_SUFFIXES
        ),
        "linked_votes": lambda: rewrite_votes(stages["votes_cut"], stages["canon_map"]),
        # single-phase ensemble: the canonical rewrite is two broadcast
        # hash joins riding the same codegen stage as the aggregation's
        # map side — a measured two-phase variant (pre_aggregate_votes +
        # recombine, optionally overlapping the canon window on a
        # second job thread) saved nothing here and added a spool write
        # plus scheduling nondeterminism; it remains available in
        # operators/ensemble.py for canon maps too big to broadcast
        "candidates": lambda: combine_votes(
            stages["linked_votes"], combination=combination
        ),
        "alt_names": lambda: emit_alternate_names(
            stages["canon_map"], stages["surfaces"]
        ),
        "triples": lambda: apply_consistency(
            stages["candidates"].unionByName(
                stages["alt_names"], allowMissingColumns=True
            ),
            spark,
            assume_unique=True,
        ),
    }
    stages._builders = builders
    stages.update({"transcripts": t, "sentences": sentences, "votes": votes})
    return stages


def final_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_stages(spark, sf_dir)["triples"]


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    combination: str = AGREE_MOST,
) -> dict[str, object]:
    """Materialized, resumable execution (SURVEY.md §7 stage graph).

    Each stage lands as a parquet table + lineage manifest under
    ``checkpoint_dir``; re-running after a crash (or with some stages
    deleted) recomputes only invalid stages — the Spark analog of the
    reference's Postgres caches (S9). The final triple store is
    partitioned by relation (S11 predictions.tab analog).
    """
    import os

    from ..sources.sinks import checkpoint_stage, fingerprint, read_manifest

    cfg = {"sf_dir": sf_dir, "combination": combination, "version": 3}

    fp_sent = fingerprint("sentences", cfg, [])
    sentences = checkpoint_stage(
        spark,
        lambda: build_stages(spark, sf_dir, combination)["sentences"],
        os.path.join(checkpoint_dir, "sentences"),
        fp_sent,
    )

    # ONE extraction: the Arrow pass (the pipeline's most expensive
    # stage) lands as its own checkpointed table; the canon-map build,
    # the vote rewrite AND the alternate-name surface set all read this
    # parquet scan instead of re-running the extraction (three times,
    # as the pre-v3 layout did).
    fp_votes_raw = fingerprint("votes", cfg, [fp_sent])
    votes = checkpoint_stage(
        spark,
        lambda: extract_votes(sentences),
        os.path.join(checkpoint_dir, "votes"),
        fp_votes_raw,
    )

    fp_canon = fingerprint("canon_map", cfg, [fp_votes_raw])
    canon_map = checkpoint_stage(
        spark,
        lambda: build_canon_map(
            vote_surfaces(votes).localCheckpoint(eager=True),
            alias_dict_df(spark, sf_dir),
            NICKNAMES,
            CORP_SUFFIXES,
        ),
        os.path.join(checkpoint_dir, "canon_map"),
        fp_canon,
    )

    fp_votes = fingerprint("linked_votes", cfg, [fp_votes_raw, fp_canon])
    linked_votes = checkpoint_stage(
        spark,
        lambda: rewrite_votes(votes, canon_map),
        os.path.join(checkpoint_dir, "linked_votes"),
        fp_votes,
    )

    fp_cand = fingerprint("candidates", cfg, [fp_votes, fp_canon])
    candidates = checkpoint_stage(
        spark,
        lambda: combine_votes(linked_votes, combination=combination).unionByName(
            emit_alternate_names(canon_map, vote_surfaces(votes)),
            allowMissingColumns=True,
        ),
        os.path.join(checkpoint_dir, "candidates"),
        fp_cand,
    )

    fp_triples = fingerprint("triples", cfg, [fp_cand])
    triples = checkpoint_stage(
        spark,
        lambda: apply_consistency(candidates, spark),
        os.path.join(checkpoint_dir, "triples"),
        fp_triples,
        partition_by="relation",
    )

    manifests = {
        name: read_manifest(os.path.join(checkpoint_dir, name))
        for name in (
            "sentences", "votes", "canon_map", "linked_votes", "candidates", "triples"
        )
    }
    return {"triples": triples, "manifests": manifests}
